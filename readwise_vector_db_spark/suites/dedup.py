"""Dedup suite over the ``documents`` / ``embeddings`` fixtures.

The fixture corpus has real near-duplicates (shingle-Jaccard ≈ 0.99
pairs) but no byte-identical texts and no high-cosine embedding pairs,
so the exact/embedding strategies are exercised on a deterministically
augmented input: every 20th row is re-injected with id+1_000_000 — the
same UNION ALL construction on both engines, so the oracle still
hash-checks the operator end-to-end.

MinHash-LSH and SimHash use xxhash64, which DuckDB lacks → rows-only
driver check; their fidelity against exact Jaccard is asserted in
tests/test_dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators import dedup as dd
from readwise_vector_db_spark.registry import register
from readwise_vector_db_spark.sources.tables import load_table

_AUG_DOCS_SQL = """
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0
"""


def _augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 20 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return docs.unionByName(dups)


@register(
    "dedup_exact",
    f"""
    WITH aug AS ({_AUG_DOCS_SQL}),
    fps AS (SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
            FROM aug)
    SELECT fp, COUNT(*) AS n, MIN(doc_id) AS keep_id
    FROM fps GROUP BY fp HAVING COUNT(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups on the augmented corpus (25 injected groups)."""
    return dd.exact_dedup_groups(_augmented_docs(spark, sf_dir))


@register(
    "dedup_ngram_jaccard",
    """
    WITH sh AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   range(1, len(string_split_regex(text, '\\s+')) - 1),
                   i -> string_split_regex(text, '\\s+')[i] || ' ' ||
                        string_split_regex(text, '\\s+')[i+1] || ' ' ||
                        string_split_regex(text, '\\s+')[i+2])) AS sh
        FROM documents
    ),
    ex AS (SELECT id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter,
               any_value(a.n_sh) AS na, any_value(b.n_sh) AS nb
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b,
               ROUND(inter / (na + nb - inter), 6) AS jaccard
        FROM inter)
    WHERE jaccard >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-shingle Jaccard pairs ≥ 0.6 via inverted-index self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, threshold=0.6)


@register(
    "dedup_embedding",
    """
    WITH aug AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL AND vec_id % 20 = 0
    )
    SELECT id_a, id_b, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                     6) AS cos_sim
        FROM aug a JOIN aug b ON a.vec_id < b.vec_id)
    WHERE cos_sim >= 0.999
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dups on the augmented embeddings (25 planted)."""
    embs = load_table(spark, sf_dir, "embeddings")
    dups = embs.filter(F.col("vec_id") % 20 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    return dd.embedding_cosine_pairs(embs.unionByName(dups), threshold=0.999)


@register("dedup_minhash_lsh", None)  # xxhash64 not expressible in DuckDB
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 16×4 banded LSH candidates, est. Jaccard ≥ 0.6."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, threshold=0.6)


@register("dedup_simhash", None)  # xxhash64 not expressible in DuckDB
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs with hamming ≤ 3 via 16-bit chunk LSH."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_pairs(docs, max_hamming=3)
