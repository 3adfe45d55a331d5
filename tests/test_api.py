"""Protocol surface: request validation, result shaping, SSE/JSON-RPC framing,
and an end-to-end Spark-backed MCP TCP round-trip."""

from __future__ import annotations

import asyncio
import json
import threading

import pytest

from readwise_vector_db_spark.api import framing
from readwise_vector_db_spark.api.models import (
    InvalidParams,
    SearchRequest,
    shape_result,
)
from readwise_vector_db_spark.api.service import SearchService

SF_DIR = "/root/testdata/sf0.001"


# --- request validation ------------------------------------------------------


def test_request_requires_q():
    with pytest.raises(InvalidParams):
        SearchRequest.from_dict({})
    with pytest.raises(InvalidParams):
        SearchRequest.from_dict({"q": "   "})


def test_request_k_clamp():
    assert SearchRequest.from_dict({"q": "x", "k": 0}).clamped_k() == 1
    assert SearchRequest.from_dict({"q": "x", "k": 500}).clamped_k() == 100
    assert SearchRequest.from_dict({"q": "x"}).clamped_k() == 20


def test_request_date_range_parsing():
    req = SearchRequest.from_dict(
        {"q": "x", "highlighted_at_range": ["2024-01-01", "2024-02-01"]}
    )
    assert req.highlighted_at_range[0].year == 2024
    with pytest.raises(InvalidParams):
        SearchRequest.from_dict({"q": "x", "highlighted_at_range": ["nope", "2024-02-01"]})
    with pytest.raises(InvalidParams):
        SearchRequest.from_dict({"q": "x", "tags": "not-a-list"})


def test_result_default_key_fill():
    shaped = shape_result({"id": "1", "text": "t", "score": 0.25})
    for key in ("source_id", "title", "author", "url", "tags", "highlighted_at", "updated_at"):
        assert shaped[key] is None
    assert shaped["score"] == 0.25


# --- framing -----------------------------------------------------------------


def test_sse_stream_frames():
    frames = list(framing.sse_stream([{"id": "1"}, {"id": "2"}]))
    assert frames[0] == 'event: result\ndata: {"id": "1"}\n\n'
    assert frames[-1] == 'event: complete\ndata: {"total": 2}\n\n'


def test_sse_stream_error_frame():
    def boom():
        yield {"id": "1"}
        raise RuntimeError("kaput")

    frames = list(framing.sse_stream(boom()))
    assert frames[-1].startswith("event: error\n")
    assert "kaput" in frames[-1]


def test_jsonrpc_roundtrip():
    msg = framing.request("search", {"q": "hello"}, request_id=7)
    packed = framing.pack_message(msg)
    assert packed.endswith(b"\n")
    assert framing.unpack_message(packed) == msg
    with pytest.raises(framing.FramingError):
        framing.unpack_message(b"{not json\n")
    with pytest.raises(framing.ProtocolError):
        framing.unpack_message(b'["array"]\n')


# --- end-to-end MCP over TCP -------------------------------------------------


@pytest.fixture(scope="module")
def mcp_endpoint(spark):
    from readwise_vector_db_spark.api.server import McpServer

    svc = SearchService(spark, SF_DIR)
    server = McpServer(svc, port=0)
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def go():
            await server.start()
            started.set()
            await server.serve_forever()

        try:
            loop.run_until_complete(go())
        except asyncio.CancelledError:
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(timeout=60)
    yield server.host, server.port
    loop.call_soon_threadsafe(lambda: [task.cancel() for task in asyncio.all_tasks(loop)])
    t.join(timeout=10)


def _rpc_lines(host, port, payload: bytes, n_expected: int | None = None) -> list[dict]:
    import socket

    with socket.create_connection((host, port), timeout=120) as s:
        s.sendall(payload)
        s.shutdown(socket.SHUT_WR)
        buf = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf = buf + chunk
    return [json.loads(line) for line in buf.splitlines() if line.strip()]


def test_mcp_search_streams_per_result(mcp_endpoint):
    host, port = mcp_endpoint
    req = framing.pack_message(
        framing.request("search", {"q": "spark window merge", "k": 3}, request_id=1)
    )
    frames = _rpc_lines(host, port, req)
    assert len(frames) == 3
    for f in frames:
        assert f["jsonrpc"] == "2.0"
        assert f["id"] == "1"
        assert set(f["result"]) == {"id", "text", "score"}
    scores = [f["result"]["score"] for f in frames]
    assert scores == sorted(scores)


def test_mcp_zero_results_empty_array(mcp_endpoint):
    host, port = mcp_endpoint
    req = framing.pack_message(
        framing.request("search", {"q": "anything", "lang": "zz-none"}, request_id=2)
    )
    frames = _rpc_lines(host, port, req)
    assert len(frames) == 1
    assert frames[0]["result"] == []


def test_mcp_error_taxonomy(mcp_endpoint):
    host, port = mcp_endpoint
    bad_json = b"{nope\n"
    unknown = framing.pack_message(framing.request("explode", {}, request_id=3))
    bad_params = framing.pack_message(framing.request("search", {"k": 5}, request_id=4))
    frames = _rpc_lines(host, port, bad_json + unknown + bad_params)
    codes = [f["error"]["code"] for f in frames]
    assert codes == [
        framing.ErrorCodes.PARSE_ERROR,
        framing.ErrorCodes.METHOD_NOT_FOUND,
        framing.ErrorCodes.INVALID_PARAMS,
    ]


# --- service over Spark ------------------------------------------------------


def test_service_search_and_stream_agree(spark):
    svc = SearchService(spark, SF_DIR)
    req = SearchRequest(q="table scan hash", k=5)
    collected = svc.search(req)
    streamed = list(svc.stream(req))
    assert [r["id"] for r in collected] == [r["id"] for r in streamed]
    assert len(collected) == 5
    for r in collected:
        assert r["title"] is None  # default-key fill applied
        assert isinstance(r["score"], float)


def test_service_warm_and_cold_paths_agree(spark):
    """The default warm service (single-SQL fast path over the bucketed
    layout) must return exactly what the cold indexed plan returns."""
    req = SearchRequest(q="table scan hash", k=7, lang="en")
    warm = SearchService(spark, SF_DIR).search(req)
    cold = SearchService(spark, SF_DIR, warm=False).search(req)
    assert warm == cold
    assert len(warm) == 7


def test_cli_search_json(spark, capsys):
    import readwise_vector_db_spark.main as cli

    rc = cli.main(["--sf-dir", SF_DIR, "search", "spark join", "--k", "3", "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["results"]) == 3


# --- HTTP surface ------------------------------------------------------------


@pytest.fixture(scope="module")
def http_endpoint(spark):
    import threading

    from readwise_vector_db_spark.api.http_server import serve

    svc = SearchService(spark, SF_DIR)
    server = serve(svc)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://{server.server_address[0]}:{server.server_address[1]}"
    server.shutdown()


def test_http_post_search(http_endpoint):
    import urllib.request

    req = urllib.request.Request(
        f"{http_endpoint}/search",
        data=json.dumps({"q": "spark window merge", "k": 4}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        body = json.loads(resp.read())
    assert len(body["results"]) == 4
    first = body["results"][0]
    assert {"id", "text", "score", "title", "url"} <= set(first)


def test_http_post_search_validation_422(http_endpoint):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        f"{http_endpoint}/search", data=b'{"k": 3}',
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 422


def test_http_sse_stream(http_endpoint):
    import urllib.request

    with urllib.request.urlopen(
        f"{http_endpoint}/mcp/stream?q=table+scan&k=3", timeout=120
    ) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "text/event-stream"
        payload = resp.read().decode()
    frames = [f for f in payload.split("\n\n") if f.strip()]
    assert sum(1 for f in frames if f.startswith("event: result")) == 3
    assert frames[-1].startswith("event: complete")
    assert '"total": 3' in frames[-1]


def _parse_prometheus(text: str) -> dict[str, float]:
    """Minimal exposition-format parser: sample name{labels} -> value."""
    samples: dict[str, float] = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        name, value = line.rsplit(" ", 1)
        samples[name] = float(value)
    return samples


def test_http_metrics_counters(http_endpoint):
    import urllib.request

    def get_metrics():
        with urllib.request.urlopen(f"{http_endpoint}/metrics", timeout=60) as r:
            assert r.headers["Content-Type"].startswith("text/plain; version=0.0.4")
            return _parse_prometheus(r.read().decode())

    before = get_metrics()
    req = urllib.request.Request(
        f"{http_endpoint}/search",
        data=json.dumps({"q": "hash join", "k": 2}).encode(),
        headers={"Content-Type": "application/json"},
    )
    urllib.request.urlopen(req, timeout=120).read()
    after = get_metrics()
    assert after["searches_total"] == before["searches_total"] + 1
    assert after["results_total"] == before["results_total"] + 2
    # reference metric families exist in scrapeable form (api/routes.py:237-243)
    assert "rows_synced_total" in after
    assert "error_rate" in after
    assert 'sync_duration_seconds_bucket{le="+Inf"}' in after
    assert "sync_duration_seconds_count" in after


def test_prometheus_text_format():
    from readwise_vector_db_spark.api.metrics import default_registry

    reg = default_registry()
    reg.get("rows_synced_total").inc(41)
    reg.get("sync_duration_seconds").observe(0.3)
    reg.get("sync_duration_seconds").observe(7.0)
    text = reg.render()
    assert "# HELP rows_synced_total Total rows synced by the sync service" in text
    assert "# TYPE rows_synced_total counter" in text
    assert "rows_synced_total 41.0" in text
    assert "# TYPE sync_duration_seconds histogram" in text
    # cumulative buckets: 0.3 lands in le=0.5, both land in le=10.0 and +Inf
    assert 'sync_duration_seconds_bucket{le="0.5"} 1.0' in text
    assert 'sync_duration_seconds_bucket{le="10.0"} 2.0' in text
    assert 'sync_duration_seconds_bucket{le="+Inf"} 2.0' in text
    assert "sync_duration_seconds_sum 7.3" in text
    assert "sync_duration_seconds_count 2.0" in text
    with pytest.raises(ValueError):
        reg.get("error_rate").inc(-1)


def test_request_rejects_bool_k_and_accepts_empty_tags():
    # bool is an int subclass — must still be rejected as k
    with pytest.raises(InvalidParams):
        SearchRequest.from_dict({"q": "x", "k": True})
    req = SearchRequest.from_dict({"q": "x", "tags": []})
    assert req.tags == []


# --- graceful shutdown drain -------------------------------------------------


class _SlowService:
    """Search that blocks until released — holds a request in-flight so the
    test can call stop() mid-request (no Spark needed)."""

    def __init__(self):
        self.started = threading.Event()
        self.release = threading.Event()

    def search(self, req):
        self.started.set()
        assert self.release.wait(timeout=30)
        return [{"id": str(i), "text": f"t{i}", "score": 0.1 * i} for i in range(3)]


def test_mcp_stop_drains_inflight_search():
    """Reference mcp/server.py:231-294 drains in-flight client tasks on
    shutdown; a client mid-stream must get its final frames, then EOF —
    not a truncated stream."""
    from readwise_vector_db_spark.api.server import McpServer

    async def scenario():
        svc = _SlowService()
        server = McpServer(svc, port=0)
        await server.start()
        reader, writer = await asyncio.open_connection(server.host, server.port)
        writer.write(framing.pack_message(framing.request("search", {"q": "x"}, 1)))
        await writer.drain()
        loop = asyncio.get_running_loop()
        # request is now in-flight inside the executor
        await loop.run_in_executor(None, svc.started.wait, 10)
        stop_task = asyncio.create_task(server.stop())
        await asyncio.sleep(0.1)  # let stop() close the listener and reach the drain
        assert not stop_task.done(), "stop() returned while a request was in flight"
        svc.release.set()
        frames = []
        while True:
            line = await asyncio.wait_for(reader.readline(), timeout=10)
            if not line:
                break  # EOF — server closed the connection after the stream
            frames.append(framing.unpack_message(line))
        await asyncio.wait_for(stop_task, timeout=10)
        writer.close()
        return frames

    frames = asyncio.run(scenario())
    assert len(frames) == 3
    assert [f["result"]["id"] for f in frames] == ["0", "1", "2"]
