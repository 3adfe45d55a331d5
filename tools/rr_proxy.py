"""Minimal round-robin HTTP reverse proxy for the serving scale-out bench.

The r5 verdict asked for the 2-JVM 20-user measurement to go through a
REAL balancer hop, not just client-side backend pinning.  This is that
balancer: a stdlib ThreadingHTTPServer that forwards each request to the
next backend in rotation (one atomic counter — no stickiness, the
least favorable fair policy for caches) and streams the response back.
Adds one local TCP hop + one python thread per in-flight request, i.e.
the same order of overhead a sidecar nginx/haproxy adds.

Usage: python tools/rr_proxy.py <listen_port> <backend_port> [...]
Prints READY when listening.  Library use: ``serve_proxy(...)``.
"""

from __future__ import annotations

import itertools
import sys
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_HOP_HEADERS = {"connection", "keep-alive", "transfer-encoding", "host"}


def make_handler(backends: list[str]):
    rr = itertools.cycle(backends)
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet bench output
            pass

        def _forward(self) -> None:
            with lock:
                backend = next(rr)
            body = None
            length = int(self.headers.get("Content-Length", 0) or 0)
            if length:
                body = self.rfile.read(length)
            req = urllib.request.Request(
                f"{backend}{self.path}", data=body, method=self.command
            )
            for k, v in self.headers.items():
                if k.lower() not in _HOP_HEADERS and k.lower() != "content-length":
                    req.add_header(k, v)
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    payload = resp.read()
                    self.send_response(resp.status)
                    for k, v in resp.headers.items():
                        if k.lower() not in _HOP_HEADERS and k.lower() != "content-length":
                            self.send_header(k, v)
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
            except urllib.error.HTTPError as e:  # pass backend errors through
                payload = e.read()
                self.send_response(e.code)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        do_GET = do_POST = _forward

    return Handler


def serve_proxy(backends: list[str], host: str = "127.0.0.1", port: int = 0):
    server = ThreadingHTTPServer((host, port), make_handler(backends))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def main() -> None:
    listen = int(sys.argv[1])
    backends = [f"http://127.0.0.1:{p}" for p in sys.argv[2:]]
    server = serve_proxy(backends, port=listen)
    print(f"READY {server.server_address[1]}", flush=True)
    threading.Event().wait()


if __name__ == "__main__":
    main()
