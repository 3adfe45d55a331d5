"""Query registry: every implemented operator gets a (spark_fn, oracle_sql) pair.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
the oracle is ANSI SQL DuckDB runs over the same parquet tables (views:
region nation customer supplier part orders lineitem events documents
embeddings).  ``None`` oracle → driver does a rows-only check (reserved
for genuinely non-SQL-expressible ops).

Cross-engine hashing rules every entry follows:

- Column names aliased identically on both sides (driver sorts columns
  by name before hashing values).
- No raw TIMESTAMP output columns — DATE, epoch BIGINT, or strings.
- Double aggregates routed through DECIMAL so partial-aggregation order
  cannot perturb the result, then rounded and cast back to DOUBLE.
- Top-k orderings always carry a deterministic tie-break key.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a query + its DuckDB oracle to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
