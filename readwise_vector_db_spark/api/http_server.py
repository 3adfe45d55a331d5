"""HTTP surface: ``POST /search`` + SSE ``GET /mcp/stream`` (stdlib).

Behavioral parity with the reference's FastAPI app (studied, not
copied): ``POST /search`` returns ``{"results": [...]}`` with default-
key-filled result dicts and 422 on validation errors; ``GET
/mcp/stream`` emits ``event: result`` frames then ``event: complete``
(reference ``api/routes.py``).  Implemented on ``ThreadingHTTPServer``
so the engine has zero web-framework dependencies; the protocol layer
is engine-independent (api/framing.py) and the Spark work happens in
``SearchService`` exactly as for the MCP TCP path.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from readwise_vector_db_spark.api import framing
from readwise_vector_db_spark.api.models import InvalidParams, SearchRequest
from readwise_vector_db_spark.api.service import SearchService


def make_handler(service: SearchService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet test output
            pass

        def _json(self, code: int, body: dict) -> None:
            data = json.dumps(body, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            url = urlparse(self.path)
            if url.path == "/health":
                return self._json(200, {"status": "ok"})
            if url.path == "/metrics":
                # Prometheus text exposition, scrape-compatible with the
                # reference's prometheus_client output (api/routes.py:224-247)
                data = service.registry.render().encode()
                self.send_response(200)
                self.send_header("Content-Type", service.registry.CONTENT_TYPE)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return None
            if url.path != "/mcp/stream":
                return self._json(404, {"detail": "not found"})
            qs = {k: v[0] for k, v in parse_qs(url.query).items()}
            params: dict = {"q": qs.get("q", "")}
            if "k" in qs:
                try:
                    params["k"] = int(qs["k"])
                except ValueError:
                    return self._json(422, {"detail": "'k' must be an integer"})
            for key in ("source_type", "author", "lang"):
                if key in qs:
                    params[key] = qs[key]
            try:
                req = SearchRequest.from_dict(params)
            except InvalidParams as e:
                return self._json(422, {"detail": str(e)})
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            for frame in framing.sse_stream(service.stream(req)):
                self.wfile.write(frame.encode())
                self.wfile.flush()

        def do_POST(self):  # noqa: N802
            if urlparse(self.path).path != "/search":
                return self._json(404, {"detail": "not found"})
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._json(422, {"detail": "invalid JSON body"})
            try:
                req = SearchRequest.from_dict(body)
            except InvalidParams as e:
                return self._json(422, {"detail": str(e)})
            try:
                results = service.search(req)
            except Exception as e:  # noqa: BLE001 — surface as HTTP 500
                return self._json(500, {"detail": str(e)})
            return self._json(200, {"results": results})

    return Handler


def serve(service: SearchService, host: str = "127.0.0.1", port: int = 0):
    """Create (not start) the server; caller runs serve_forever()."""
    return ThreadingHTTPServer((host, port), make_handler(service))
