"""Public query surface: importing this module populates the registry.

See ``registry.py`` for the cross-engine hashing rules every entry
follows, and ``suites/`` for the implementations.
"""

from __future__ import annotations

from readwise_vector_db_spark import suites  # noqa: F401  (populates registry)
from readwise_vector_db_spark.registry import oracle_sql, queries  # noqa: F401
from readwise_vector_db_spark.suites.vector_search import search_topk  # noqa: F401
