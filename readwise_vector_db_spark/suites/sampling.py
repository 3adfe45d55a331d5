"""Training-mix suite: deterministic sampling / split / packing queries.

All four queries run the md5 portable-hash path so DuckDB reproduces
the bucket assignment bit-for-bit (the 60-bit ``hash64`` trick the
dedup suite established); production uses xxhash64 via the operators'
``base_hash`` default.  Weights/quotas are small demo values — the
operators take them as parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from readwise_vector_db_spark.operators import sampling as sp
from readwise_vector_db_spark.registry import register, register_extra
from readwise_vector_db_spark.sources.tables import load_table

# DuckDB twin of operators/sampling._bucket on the md5 path:
# 60-bit hash of "<salt>:<id>" → bucket in [0, 2**20)
def _bucket_sql(salt: str, id_expr: str = "doc_id") -> str:
    return (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {sp._RATE_DEN}"
    )


_MIX_RATES = {"src1": 1.0, "src2": 0.5, "src3": 0.25}
_MIX_DEFAULT = 0.1


def _rate_case() -> str:
    den = sp._RATE_DEN
    whens = "\n               ".join(
        f"WHEN source = '{g}' THEN {int(r * den)}"
        for g, r in sorted(_MIX_RATES.items())
    )
    return f"CASE {whens} ELSE {int(_MIX_DEFAULT * den)} END"


@register_extra(
    "mix_sample_sources",
    f"""
    SELECT doc_id, source FROM documents
    WHERE {_bucket_sql("mix")} < {_rate_case()}
    """,
)
def mix_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture sampling, map-only (no shuffle at any scale)."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return sp.mixture_sample(
        docs, _MIX_RATES, default_rate=_MIX_DEFAULT, base_hash="md5"
    ).select("doc_id", "source")


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _split_bounds() -> list[tuple[str, int]]:
    """Same float accumulation as operators/sampling.dataset_split, so
    the SQL thresholds are bit-identical with the Column expression's."""
    bounds, cum = [], 0.0
    for name, w in _SPLIT_WEIGHTS.items():
        cum += w
        bounds.append((name, int(round(cum * sp._RATE_DEN))))
    return bounds


def _split_case() -> str:
    whens = "\n                ".join(
        f"WHEN b < {hi} THEN '{name}'" for name, hi in _split_bounds()
    )
    return f"CASE {whens} END"


@register(
    "dataset_split_q",
    f"""
    SELECT doc_id,
           {_split_case()} AS split
    FROM (SELECT doc_id, {_bucket_sql("split")} AS b FROM documents)
    """,
)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/10/10 split: a doc's split depends only on its own id
    hash, so it never migrates as the corpus grows."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return sp.dataset_split(docs, _SPLIT_WEIGHTS, base_hash="md5").select(
        "doc_id", "split"
    )


@register(
    "quota_sample_sources",
    f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {_bucket_sql("quota")} ASC, doc_id ASC) AS rk
        FROM documents)
    WHERE rk <= 5
    """,
)
def quota_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source cap of 5 docs, hash-ordered: a deterministic
    uniform sample without replacement; one shuffle on the group key."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return sp.quota_sample(docs, quota=5, base_hash="md5").select("doc_id", "source")


_PACK_CAPACITY = 4096  # n_chars budget per packed sequence
_PACK_SHARDS = 4


@register(
    "pack_sequences_q",
    f"""
    SELECT doc_id, shard,
           CAST(end_tok - n_chars AS BIGINT) AS start_tok,
           CAST(FLOOR((end_tok - n_chars) / {_PACK_CAPACITY}) AS BIGINT) AS seq_first,
           CAST(FLOOR((end_tok - 1) / {_PACK_CAPACITY}) AS BIGINT) AS seq_last
    FROM (
        SELECT doc_id, shard, n_chars,
               CAST(SUM(n_chars) OVER (
                   PARTITION BY shard ORDER BY doc_id ASC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_tok
        FROM (
            SELECT doc_id, n_chars,
                   CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % {_PACK_SHARDS} AS INT) AS shard
            FROM documents)
    )
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 4096-char sequences across 4 hash
    shards; emits each doc's stream offset and first/last sequence.
    Any token counter plugs in via token_col — the fixture's n_chars
    column stands in for a tokenizer here."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return sp.pack_sequences(
        docs,
        capacity=_PACK_CAPACITY,
        n_shards=_PACK_SHARDS,
        token_col="n_chars",
        base_hash="md5",
    ).select("doc_id", "shard", "start_tok", "seq_first", "seq_last")


# --- deterministic global shuffle -------------------------------------------
#
# Training-order assignment: the full (doc_id -> shuffle_pos) bijection
# is value-hash-checked, so bucketing, offset arithmetic, and the
# within-bucket ranking must all agree with the oracle's single
# row_number() — the oracle spells the naive single-sort the operator
# exists to avoid.

_SHUFFLE_ORACLE = """
    WITH k AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY h % 64, h, doc_id) - 1 AS BIGINT)
               AS shuffle_pos
    FROM k
"""


@register_extra("shuffle_order_q", _SHUFFLE_ORACLE)
def shuffle_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle position for every document
    (seed "epoch0"): two-phase bucket-offset + within-bucket rank
    (operators/sampling.py:shuffle_order) vs the oracle's naive global
    row_number() — same bijection, no single-partition sort."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True).select("doc_id")
    return sp.shuffle_order(
        docs, seed="epoch0", n_buckets=64, base_hash="md5"
    ).select("doc_id", "shuffle_pos")


@register_extra(
    "dataset_split_stratified_q",
    f"""
    SELECT doc_id, source,
           CASE WHEN frac <= 0.8 THEN 'train'
                WHEN frac <= 0.9 THEN 'val'
                WHEN frac <= 1.0 THEN 'test' END AS split
    FROM (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY {_bucket_sql("split")} ASC, doc_id ASC) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY source) AS frac
        FROM documents)
    """,
)
def dataset_split_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 80/10/10 WITHIN each source: in-stratum hash rank cut at
    the stratum's own cumulative boundaries — every stratum within one
    row of its target proportion, where the stable hash split is only
    proportional in expectation.  One shuffle on the stratum key."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return sp.dataset_split_stratified(
        docs, _SPLIT_WEIGHTS, strata_col="source", base_hash="md5"
    ).select("doc_id", "source", "split")
