"""JSON-RPC-over-TCP MCP server (reference ``mcp/server.py``), Spark-backed.

Per connection: read NDJSON JSON-RPC frames, dispatch ``search``, write
one response frame per result (back-pressure via ``writer.drain()``),
empty-array response when nothing matches, JSON-RPC error codes for the
failure taxonomy.  Graceful shutdown waits for in-flight handlers.
"""

from __future__ import annotations

import asyncio
import logging
from typing import Any

from readwise_vector_db_spark.api import framing
from readwise_vector_db_spark.api.models import InvalidParams, SearchRequest
from readwise_vector_db_spark.api.service import SearchService

logger = logging.getLogger(__name__)


class McpServer:
    def __init__(self, service: SearchService, host: str = "127.0.0.1", port: int = 8375):
        self.service = service
        self.host = host
        self.port = port
        self._server: asyncio.AbstractServer | None = None
        # graceful-shutdown bookkeeping (reference mcp/server.py:231-294):
        # in-flight request tasks are awaited by stop() before connections
        # close, so a client mid-stream receives its final frames
        self._inflight: set[asyncio.Task] = set()
        self._connections: set[asyncio.StreamWriter] = set()

    async def _handle_search(
        self, writer: asyncio.StreamWriter, params: dict[str, Any] | None, rid: Any
    ) -> None:
        req = SearchRequest.from_dict(params or {})
        loop = asyncio.get_running_loop()
        # Spark collect happens off the event loop; k ≤ 100 keeps it small
        results = await loop.run_in_executor(None, self.service.search, req)
        rid_out = str(rid) if rid is not None else "null"
        sent = 0
        for result in results:
            frame = framing.response(
                {"id": result["id"], "text": result["text"], "score": result["score"]},
                rid_out,
            )
            writer.write(framing.pack_message(frame))
            await writer.drain()  # back-pressure: don't outrun the client
            sent += 1
        if sent == 0:
            writer.write(framing.pack_message(framing.response([], rid_out)))
            await writer.drain()

    async def _handle_client(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        self._connections.add(writer)
        try:
            while True:
                line = await reader.readline()
                if not line:
                    break
                rid: Any = None
                try:
                    msg = framing.unpack_message(line)
                    rid = msg.get("id")
                    method = msg.get("method")
                    if method != "search":
                        frame = framing.error(
                            framing.ErrorCodes.METHOD_NOT_FOUND,
                            f"unknown method {method!r}",
                            rid,
                        )
                    else:
                        # run as a tracked task so stop() can drain it
                        task = asyncio.ensure_future(
                            self._handle_search(writer, msg.get("params"), rid)
                        )
                        self._inflight.add(task)
                        task.add_done_callback(self._inflight.discard)
                        await task
                        continue
                except framing.FramingError as e:
                    frame = framing.error(framing.ErrorCodes.PARSE_ERROR, str(e), rid)
                except framing.ProtocolError as e:
                    frame = framing.error(
                        framing.ErrorCodes.INVALID_REQUEST, str(e), rid
                    )
                except InvalidParams as e:
                    frame = framing.error(
                        framing.ErrorCodes.INVALID_PARAMS, str(e), rid
                    )
                except Exception as e:  # noqa: BLE001 — report as JSON-RPC error
                    logger.exception("search failed")
                    frame = framing.error(
                        framing.ErrorCodes.INTERNAL_ERROR, str(e), rid
                    )
                writer.write(framing.pack_message(frame))
                await writer.drain()
        finally:
            self._connections.discard(writer)
            writer.close()
            try:
                await writer.wait_closed()
            except (ConnectionError, OSError):
                pass

    async def start(self) -> None:
        self._server = await asyncio.start_server(
            self._handle_client, self.host, self.port
        )
        self.port = self._server.sockets[0].getsockname()[1]

    async def serve_forever(self) -> None:
        if self._server is None:
            await self.start()
        assert self._server is not None
        async with self._server:
            await self._server.serve_forever()

    async def stop(self, drain_timeout: float = 5.0) -> None:
        """Graceful shutdown: stop accepting, drain in-flight requests
        (bounded by ``drain_timeout``), then close remaining connections.
        A client streaming a response when stop() is called receives every
        remaining frame before its socket closes; only handlers that
        overrun the timeout are cancelled."""
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
        if self._inflight:
            done, pending = await asyncio.wait(
                set(self._inflight), timeout=drain_timeout
            )
            for task in pending:
                task.cancel()
            if pending:
                logger.warning("cancelled %d handlers at drain timeout", len(pending))
        for writer in list(self._connections):
            writer.close()
            try:
                await writer.wait_closed()
            except (ConnectionError, OSError):
                pass
        self._connections.clear()
