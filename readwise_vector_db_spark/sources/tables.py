"""Parquet table loaders + the ``highlights`` view assembly.

The reference's one fact table is ``highlight`` (reference:
``models/highlight.py:10-26``): id, text, source metadata, tags,
timestamps, and a nullable embedding column.  The driver fixtures model
this as two tables — ``documents`` (doc_id, text, lang, source, n_chars)
and ``embeddings`` (vec_id, embedding array<float>, label) — which we
join 1:1 on ``doc_id = vec_id`` into a highlights-like corpus
(FIXTURES.md §1).

Scale notes:

- The documents⋈embeddings join is an equi-join on a unique key; at
  100 TB both sides are large, so it is a sort-merge join — but both
  tables would be bucketed/clustered by id in a real deployment so the
  join is co-located (zero shuffle).  Locally AQE picks the strategy.
- ``emb_norm`` is precomputed here (index-build time) so each search
  query does one dot product per row, not three.
- ``tags`` are derived deterministically from the text (first three
  tokens) purely so the reference's array-overlap filter surface
  (``tags && $n``, reference ``db/supabase_ops.py:254-256``) is testable
  against the fixture corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions.vector import l2_norm

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# Inputs smaller than this can be repartitioned to core count for free;
# anything bigger already arrives as many splits and must not be touched.
_SMALL_INPUT_BYTES = 512 * 1024 * 1024


def _input_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    parallelize: bool = False,
    columns: list[str] | None = None,
    where: Column | None = None,
) -> DataFrame:
    """Load a fixture table.

    ``parallelize=True`` is the small-input parallelization hint for
    CPU-heavy consumers (per-row string/decimal math): a small parquet
    file with one row group plans as ONE scan task no matter how many
    cores exist, serializing the whole map stage.  The hint repartitions
    to core count — but only when the input is actually small, so at
    100 TB (thousands of natural splits) it is a no-op by construction.

    ``columns``/``where`` prune BEFORE that repartition: a projection or
    filter applied by the caller afterwards would ride on the exchange,
    shuffling rows and columns the query immediately drops.  (On the
    plain unparallelized path Catalyst pushes caller-side prunes into
    the scan anyway — these args matter when the hint is on.)
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # older fixture generations stored ts as TIMESTAMP(NANOS), which a
        # plain session rejects with PARQUET_TYPE_ILLEGAL unless nanos are
        # read as long.  Current fixtures use TIMESTAMP(MICROS, utc=false)
        # (→ TIMESTAMP_NTZ), where the conf is a no-op — kept so either
        # generation loads under any caller-provided SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long fallback: truncate to micros exactly like DuckDB
        # does, then rebuild the NTZ wall time the micros fixtures produce.
        # integer division — float division would lose precision above 2^53 ns
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts DIV 1000,"
                " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
            ),
        )
    # filter BEFORE projecting: a ``where`` referencing a column outside
    # ``columns`` must not raise (Catalyst prunes to the scan either way)
    if where is not None:
        df = df.filter(where)
    if columns is not None:
        df = df.select(*columns)
    if parallelize and _input_bytes(path) < _SMALL_INPUT_BYTES:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame, table_name: str, path: str, key: str, n_buckets: int = 8
) -> None:
    """Persist ``df`` as a bucketed+sorted table — the co-location layout
    the scale notes throughout this repo assume.

    Two tables bucketed on their join keys with the same bucket count
    join with NO Exchange on either side (the scan's output partitioning
    already satisfies the join's requirement); repeated joins/aggs on the
    key amortize the one-time layout cost.  This is the plain-parquet
    analogue of the reference's HNSW index build: an offline data layout
    that queries exploit implicitly.  Proven shuffle-free in
    tests/test_bucketing.py.
    """
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def corpus_split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The highlights corpus split into (metadata, vectors) for the
    vector-first search plan (operators/search.py:semantic_search_indexed).

    ``metadata`` carries the fat columns (text, tags, ...); ``vectors`` is
    the narrow (id, embedding, emb_norm) index table.  Keeping them as two
    scans means a top-k query never shuffles text bytes: scoring reads only
    the vector columns, and metadata is joined to the k winners afterwards.

    Invariant required for join-after-limit correctness: every vector id
    has a metadata row (vec_id ⊆ doc_id — guaranteed by the fixture
    generator, FIXTURES.md §1; asserted in tests/test_search.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    meta = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        "text",
        F.col("source").alias("source_type"),
        "lang",
        "n_chars",
        F.slice(F.split(F.col("text"), " "), 1, 3).alias("tags"),
    )
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").cast("string").alias("id"), "embedding")
        .withColumn("emb_norm", l2_norm("embedding"))
    )
    return meta, vecs


def highlights(spark: SparkSession, sf_dir: str, with_norm: bool = True) -> DataFrame:
    """Assemble the highlights-like corpus: documents ⋈ embeddings.

    Output schema: id STRING, text STRING, source_type STRING, lang STRING,
    n_chars BIGINT, tags ARRAY<STRING>, embedding ARRAY<FLOAT>,
    emb_norm DOUBLE (when ``with_norm``).
    """
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    df = (
        docs.join(embs, docs["doc_id"] == embs["vec_id"], "left")
        .select(
            docs["doc_id"].cast("string").alias("id"),
            "text",
            F.col("source").alias("source_type"),
            "lang",
            "n_chars",
            F.slice(F.split(F.col("text"), " "), 1, 3).alias("tags"),
            "embedding",
        )
    )
    if with_norm:
        df = df.withColumn("emb_norm", l2_norm("embedding"))
    return df
