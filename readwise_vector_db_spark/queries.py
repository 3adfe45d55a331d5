"""Query registry: every implemented operator gets a (spark_fn, oracle_sql) pair.

``__spark_entry__.py`` exposes this registry to the driver.  Each Spark
callable takes ``(spark, sf_dir)`` and returns a DataFrame; the oracle is
ANSI SQL DuckDB runs over the same parquet tables (views: region nation
customer supplier part orders lineitem events documents embeddings).

Column names are aliased identically on both sides — the driver sorts
columns by name and hashes values, so names AND values must agree.
Doubles are rounded on both sides; aggregates over doubles go through
DECIMAL so partial-aggregation order cannot perturb the result hash.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators import search as search_ops
from readwise_vector_db_spark.sources.tables import highlights, load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None).  None → driver does rows-only check.
_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# ---------------------------------------------------------------------------
# Vector search (reference core/search.py:189-249; SURVEY §2.3)
# ---------------------------------------------------------------------------

# The oracle-checkable query vector is a stored embedding (vec_id = 0) so
# both engines read the identical floats from parquet.
_HL_ORACLE = """
    SELECT CAST(d.doc_id AS VARCHAR) AS id, d.text, d.source AS source_type,
           d.lang, d.n_chars, str_split(d.text, ' ')[1:3] AS tags,
           CAST(e.embedding AS DOUBLE[]) AS emb
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
"""

_COS_DIST = (
    "1 - list_dot_product(h.emb, q.qv)"
    " / (sqrt(list_dot_product(h.emb, h.emb)) * sqrt(list_dot_product(q.qv, q.qv)))"
)


@register(
    "search_topk",
    f"""
    WITH h AS ({_HL_ORACLE}),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT h.id, h.text, h.source_type, h.lang, h.n_chars, h.tags,
           ROUND({_COS_DIST}, 6) AS score
    FROM h, q
    WHERE h.emb IS NOT NULL
    ORDER BY score ASC, h.id ASC
    LIMIT 10
    """,
)
def search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: k=10 exact cosine top-k over the highlights corpus."""
    hl = highlights(spark, sf_dir)
    qv = search_ops.query_vector_for_id(hl, "0")
    return search_ops.semantic_search(hl, qv, search_ops.SearchParams(k=10))


@register(
    "search_filtered",
    f"""
    WITH h AS ({_HL_ORACLE}),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1)
    SELECT h.id, h.text, h.source_type, h.lang, h.n_chars, h.tags,
           ROUND({_COS_DIST}, 6) AS score
    FROM h, q
    WHERE h.emb IS NOT NULL
      AND h.lang = 'en'
      AND list_has_any(h.tags, ['the', 'spark', 'fast'])
    ORDER BY score ASC, h.id ASC
    LIMIT 20
    """,
)
def search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter surface F1+F4+lang equality with correct pre-limit semantics."""
    hl = highlights(spark, sf_dir)
    qv = search_ops.query_vector_for_id(hl, "1")
    params = search_ops.SearchParams(k=20, lang="en", tags=["the", "spark", "fast"])
    return search_ops.semantic_search(hl, qv, params)
