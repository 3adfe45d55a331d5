"""Readwise REST client: paginated export/Reader scans (stdlib urllib).

Behavioral parity with the reference client (studied, not copied —
``core/readwise.py:16-76``): Token auth header, ``pageCursor``
pagination driven by ``nextPageCursor``, ``updatedAfter`` /
``updated__gt`` pushdown params (S3), and an inter-page courtesy delay
(3 s default, reference ``core/readwise.py:10,38``).

Spark integration: the driver pulls pages (API pagination is inherently
serial — the cursor chain IS the order), dumps them as JSON lines, and
``read_export_pages_json`` + ``flatten_export_pages`` take over as a
distributed parse.  At 100 TB-of-highlights scale you'd shard by account
and run one cursor chain per shard; each chain is still serial.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from typing import Any, Callable, Iterator

EXPORT_PATH = "/api/v2/export/"
READER_PATH = "/api/v3/list/"
DEFAULT_DELAY_S = 3.0  # reference core/readwise.py:10


class ReadwiseClient:
    def __init__(
        self,
        token: str,
        base_url: str = "https://readwise.io",
        delay_seconds: float = DEFAULT_DELAY_S,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.base_url = base_url.rstrip("/")
        self.headers = {"Authorization": f"Token {token}"}
        self.delay_seconds = delay_seconds
        self._sleep = sleep

    def _get_json(self, path: str, params: dict[str, Any]) -> dict[str, Any]:
        qs = urllib.parse.urlencode({k: v for k, v in params.items() if v is not None})
        url = f"{self.base_url}{path}" + (f"?{qs}" if qs else "")
        req = urllib.request.Request(url, headers=self.headers)
        with urllib.request.urlopen(req, timeout=60) as resp:
            if resp.status >= 400:  # pragma: no cover — urllib raises first
                raise RuntimeError(f"HTTP {resp.status} from {url}")
            return json.loads(resp.read())

    def pages(
        self, path: str, params: dict[str, Any] | None = None
    ) -> Iterator[dict[str, Any]]:
        """Follow the pageCursor chain; courtesy delay between pages."""
        params = dict(params or {})
        cursor = None
        while True:
            if cursor:
                params["pageCursor"] = cursor
            page = self._get_json(path, params)
            yield page
            cursor = page.get("nextPageCursor")
            if not cursor:
                return
            self._sleep(self.delay_seconds)

    def export_pages(self, updated_after: str | None = None) -> Iterator[dict]:
        """Raw export pages (books + nested highlights); ``updated_after``
        is pushed into the request (S3)."""
        return self.pages(EXPORT_PATH, {"updatedAfter": updated_after})

    def reader_pages(self, updated_after: str | None = None) -> Iterator[dict]:
        return self.pages(READER_PATH, {"updated__gt": updated_after})


def dump_pages(pages: Iterator[dict], out_path: str) -> int:
    """Pages → JSON-lines file (the hand-off point to the Spark parse);
    returns page count."""
    n = 0
    with open(out_path, "w") as f:
        for page in pages:
            f.write(json.dumps(page) + "\n")
            n += 1
    return n
