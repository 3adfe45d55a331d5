"""Result-stream framing: SSE events and NDJSON JSON-RPC 2.0.

Behavioral parity targets (studied, not copied):

- SSE: ``event: result`` per row, ``event: complete`` with ``{"total": N}``,
  ``event: error`` with ``{"message": ...}`` (reference api/routes.py:39-66).
- MCP: one compact-JSON message per line over TCP; per-result response
  frames sharing the request id; empty-array response when no results;
  JSON-RPC 2.0 error codes (reference mcp/framing.py, mcp/server.py:100-140).
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator


class FramingError(Exception):
    """Message (de)serialization failed."""


class ProtocolError(Exception):
    """Structurally valid JSON that violates JSON-RPC."""


class ErrorCodes:
    PARSE_ERROR = -32700
    INVALID_REQUEST = -32600
    METHOD_NOT_FOUND = -32601
    INVALID_PARAMS = -32602
    INTERNAL_ERROR = -32603


# --- SSE ---------------------------------------------------------------------


def sse_event(event: str, data: Any) -> str:
    return f"event: {event}\ndata: {json.dumps(data)}\n\n"


def sse_stream(results: Iterable[dict[str, Any]]) -> Iterator[str]:
    """result* → complete frame sequence; error frame on iterator failure."""
    try:
        total = 0
        for r in results:
            yield sse_event("result", r)
            total += 1
        yield sse_event("complete", {"total": total})
    except Exception as e:  # noqa: BLE001 — protocol surface reports, not raises
        yield sse_event("error", {"message": str(e)})


def ndjson_stream(results: Iterable[dict[str, Any]]) -> Iterator[str]:
    """One compact-JSON result per line (the CLI/stdout sink, S8)."""
    for r in results:
        yield json.dumps(r, separators=(",", ":"), default=str) + "\n"


# --- JSON-RPC over NDJSON ----------------------------------------------------


def pack_message(msg: dict[str, Any]) -> bytes:
    try:
        return (json.dumps(msg, separators=(",", ":"), default=str) + "\n").encode()
    except (TypeError, ValueError) as e:
        raise FramingError(f"cannot serialize message: {e}") from e


def unpack_message(line: bytes) -> dict[str, Any]:
    try:
        data = json.loads(line.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise FramingError(f"invalid NDJSON frame: {e}") from e
    if not isinstance(data, dict):
        raise ProtocolError("JSON-RPC message must be an object")
    return data


def request(method: str, params: dict | None = None, request_id: Any = None) -> dict:
    msg: dict[str, Any] = {"jsonrpc": "2.0", "method": method}
    if params is not None:
        msg["params"] = params
    if request_id is not None:
        msg["id"] = request_id
    return msg


def response(result: Any, request_id: Any) -> dict:
    return {"jsonrpc": "2.0", "result": result, "id": request_id}


def error(code: int, message: str, request_id: Any = None) -> dict:
    return {
        "jsonrpc": "2.0",
        "error": {"code": code, "message": message},
        "id": request_id,
    }
