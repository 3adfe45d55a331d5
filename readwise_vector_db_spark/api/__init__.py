"""Protocol surface: the reference's four entry points, engine-independent.

- models.py  — request validation / result shaping (reference models/api.py)
- framing.py — SSE event frames + NDJSON JSON-RPC framing (reference
  api/routes.py:39-66, mcp/framing.py)
- service.py — request → Spark search → result dicts (reference
  mcp/search_service.py)
- server.py  — asyncio JSON-RPC-over-TCP MCP server (reference mcp/server.py)

The engine boundary is ``service.SearchService``; everything else is pure
Python and runs identically against any result iterator.
"""
