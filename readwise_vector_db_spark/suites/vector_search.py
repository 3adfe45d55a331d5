"""Vector search suite (reference core/search.py:189-249; SURVEY §2.3).

The oracle-checkable query vectors are stored embeddings (vec_id 0/1) so
both engines read identical floats from parquet; the free-text path (the
deterministic embedder UDF) is exercised in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from readwise_vector_db_spark.operators import search as search_ops
from readwise_vector_db_spark.registry import register
from readwise_vector_db_spark.sources.tables import corpus_split

# Shared oracle fragments -----------------------------------------------------

HL_ORACLE = """
    SELECT CAST(d.doc_id AS VARCHAR) AS id, d.text, d.source AS source_type,
           d.lang, d.n_chars, str_split(d.text, ' ')[1:3] AS tags,
           CAST(e.embedding AS DOUBLE[]) AS emb
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
"""

COS_DIST = (
    "1 - list_dot_product(h.emb, q.qv)"
    " / (sqrt(list_dot_product(h.emb, h.emb)) * sqrt(list_dot_product(q.qv, q.qv)))"
)


@register(
    "search_topk",
    f"""
    WITH h AS ({HL_ORACLE}),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT h.id, h.text, h.source_type, h.lang, h.n_chars, h.tags,
           ROUND({COS_DIST}, 6) AS score
    FROM h, q
    WHERE h.emb IS NOT NULL
    ORDER BY score ASC, h.id ASC
    LIMIT 10
    """,
)
def search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: k=10 exact cosine top-k, vector-first plan (score the
    narrow vector table, join metadata to the k winners)."""
    meta, vecs = corpus_split(spark, sf_dir)
    return search_ops.semantic_search_stored(
        meta, vecs, "0", search_ops.SearchParams(k=10)
    )


@register(
    "search_filtered",
    f"""
    WITH h AS ({HL_ORACLE}),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1)
    SELECT h.id, h.text, h.source_type, h.lang, h.n_chars, h.tags,
           ROUND({COS_DIST}, 6) AS score
    FROM h, q
    WHERE h.emb IS NOT NULL
      AND h.lang = 'en'
      AND list_has_any(h.tags, ['the', 'spark', 'fast'])
    ORDER BY score ASC, h.id ASC
    LIMIT 20
    """,
)
def search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter surface F1+F4+lang equality with correct pre-limit semantics;
    the metadata filters semi-join into the vector scan (id-only shuffle)."""
    meta, vecs = corpus_split(spark, sf_dir)
    params = search_ops.SearchParams(k=20, lang="en", tags=["the", "spark", "fast"])
    return search_ops.semantic_search_stored(meta, vecs, "1", params)
