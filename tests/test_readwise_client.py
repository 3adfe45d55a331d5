"""Paginated REST client against a local fixture server → Spark parse."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from readwise_vector_db_spark.sources.readwise_client import ReadwiseClient, dump_pages

PAGES = {
    None: {
        "results": [
            {
                "user_book_id": 1,
                "title": "Book A",
                "author": "Ann",
                "category": "books",
                "source": "kindle",
                "source_url": None,
                "highlights": [{"id": 1, "text": "h1"}, {"id": 2, "text": "h2"}],
            }
        ],
        "nextPageCursor": "c2",
    },
    "c2": {
        "results": [
            {
                "user_book_id": 2,
                "title": "Book B",
                "author": None,
                "category": "articles",
                "source": "reader",
                "source_url": "http://b",
                "highlights": [{"id": 3, "text": "h3"}],
            }
        ],
        "nextPageCursor": None,
    },
}


@pytest.fixture(scope="module")
def fixture_api():
    seen: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            qs = {k: v[0] for k, v in parse_qs(url.query).items()}
            seen.append({"path": url.path, "qs": qs, "auth": self.headers.get("Authorization")})
            if url.path != "/api/v2/export/":
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps(PAGES[qs.get("pageCursor")]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", seen
    server.shutdown()


def test_pagination_auth_and_pushdown(fixture_api):
    base, seen = fixture_api
    seen.clear()
    slept: list[float] = []
    client = ReadwiseClient(
        "tok123", base_url=base, delay_seconds=3.0, sleep=slept.append
    )
    pages = list(client.export_pages(updated_after="2024-01-01T00:00:00Z"))
    assert len(pages) == 2
    assert pages[1]["results"][0]["title"] == "Book B"
    assert all(s["auth"] == "Token tok123" for s in seen)
    assert seen[0]["qs"]["updatedAfter"] == "2024-01-01T00:00:00Z"  # S3 pushdown
    assert seen[1]["qs"]["pageCursor"] == "c2"
    assert slept == [3.0]  # courtesy delay between pages, not after the last


def test_dump_pages_feeds_spark_parse(spark, fixture_api, tmp_path):
    from readwise_vector_db_spark.sources.readwise_export import (
        flatten_export_pages,
        parse_export,
        read_export_pages_json,
    )

    base, _ = fixture_api
    client = ReadwiseClient("tok", base_url=base, sleep=lambda s: None)
    out = str(tmp_path / "pages.jsonl")
    assert dump_pages(client.export_pages(), out) == 2
    parsed = parse_export(
        flatten_export_pages(read_export_pages_json(spark, out))
    ).orderBy("id")
    rows = parsed.collect()
    assert [r["id"] for r in rows] == ["1", "2", "3"]
    assert rows[2]["source_title"] == "Book B"
