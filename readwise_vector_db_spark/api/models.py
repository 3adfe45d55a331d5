"""Request/response records (reference ``models/api.py:7-34``), as plain
dataclasses — they only drive DataFrame transformations (SURVEY §1.1)."""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime
from typing import Any, Sequence

K_DEFAULT = 20
K_MIN, K_MAX = 1, 100  # reference api/routes.py:100

# Optional keys the reference backfills onto every result dict
# (reference api/routes.py:205-217)
RESULT_DEFAULT_KEYS = {
    "source_id": None,
    "title": None,
    "author": None,
    "url": None,
    "tags": None,
    "highlighted_at": None,
    "updated_at": None,
}


class InvalidParams(ValueError):
    """Request validation failure → JSON-RPC INVALID_PARAMS / HTTP 422."""


def _parse_date(v: Any) -> date:
    if isinstance(v, date):
        return v
    if isinstance(v, str):
        try:
            return datetime.strptime(v, "%Y-%m-%d").date()
        except ValueError as e:
            raise InvalidParams(f"invalid date {v!r}: expected YYYY-MM-DD") from e
    raise InvalidParams(f"invalid date value {v!r}")


@dataclass
class SearchRequest:
    """Validated search request (reference ``models/api.py:7-15``)."""

    q: str
    k: int = K_DEFAULT
    source_type: str | None = None
    author: str | None = None
    lang: str | None = None
    tags: Sequence[str] | None = None
    highlighted_at_range: tuple[date, date] | None = None

    @classmethod
    def from_dict(cls, params: dict[str, Any]) -> "SearchRequest":
        if not isinstance(params, dict):
            raise InvalidParams("params must be an object")
        q = params.get("q")
        if not isinstance(q, str) or not q.strip():
            raise InvalidParams("'q' is required and must be a non-empty string")
        k = params.get("k", K_DEFAULT)
        if not isinstance(k, int) or isinstance(k, bool):
            raise InvalidParams("'k' must be an integer")
        tags = params.get("tags")
        if tags is not None and (
            not isinstance(tags, (list, tuple))
            or not all(isinstance(t, str) for t in tags)
        ):
            raise InvalidParams("'tags' must be a list of strings")
        rng = params.get("highlighted_at_range")
        parsed_range = None
        if rng is not None:
            if not isinstance(rng, (list, tuple)) or len(rng) != 2:
                raise InvalidParams("'highlighted_at_range' must be [start, end]")
            parsed_range = (_parse_date(rng[0]), _parse_date(rng[1]))
        for key in ("source_type", "author", "lang"):
            v = params.get(key)
            if v is not None and not isinstance(v, str):
                raise InvalidParams(f"'{key}' must be a string")
        return cls(
            q=q,
            k=k,
            source_type=params.get("source_type"),
            author=params.get("author"),
            lang=params.get("lang"),
            tags=list(tags) if tags is not None else None,
            highlighted_at_range=parsed_range,
        )

    def clamped_k(self) -> int:
        return max(K_MIN, min(K_MAX, self.k))


def shape_result(row: dict[str, Any]) -> dict[str, Any]:
    """Row dict → API result dict with the reference's default-key fill."""
    out = dict(row)
    for k, v in RESULT_DEFAULT_KEYS.items():
        out.setdefault(k, v)
    if "score" in out and out["score"] is not None:
        out["score"] = float(out["score"])
    return out


@dataclass
class SearchResponse:
    results: list[dict[str, Any]] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {"results": self.results}
