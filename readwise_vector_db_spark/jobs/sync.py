"""Ingest pipelines: backfill (G1) and incremental sync (G2).

Reference shapes (SURVEY §2.6):

- backfill (``jobs/backfill.py:17-66``): full export scan → skip empty
  text → embed → parse → batch(100) → upsert.
- incremental (``jobs/incremental.py:22-79``): read watermark → scan
  ``updated_after`` → parse → embed(text+note) → upsert → advance
  watermark.

Spark collapses both into one declarative job each — the reference's
per-row await/batch loop becomes a single DataFrame plan where the
embedder UDF runs Arrow-batched on executors, and "batch 100 + upsert"
becomes one MERGE-style write.  The reference's serial per-row embedding
was its ingest bottleneck; here embedding throughput scales with
executors.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions.embedder import deterministic_embedder
from readwise_vector_db_spark.sources.readwise_export import (
    embed_input,
    parse_export,
    read_export_json,
)
from readwise_vector_db_spark.sources.sync_state import (
    get_sync_state,
    update_sync_state,
)
from readwise_vector_db_spark.sources.versioned import VersionedTable

SERVICE = "readwise"


def _embed_parsed(parsed: DataFrame, dim: int) -> DataFrame:
    emb = deterministic_embedder(dim=dim)
    return embed_input(parsed).withColumn("embedding", emb(F.col("embed_text"))).drop(
        "embed_text"
    )


def run_backfill(
    spark: SparkSession, export_path: str, table_path: str, dim: int = 64
) -> int:
    """Full rebuild: parse → filter empty text (backfill.py:39-44) → embed →
    commit as a fresh snapshot of the versioned highlights table.  Returns
    row count."""
    parsed = parse_export(read_export_json(spark, export_path)).filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    embedded = _embed_parsed(parsed, dim)
    table = VersionedTable(table_path)
    table.commit(embedded)
    return table.read(spark).count()


def run_incremental_sync(
    spark: SparkSession,
    export_path: str,
    table_path: str,
    state_path: str,
    now: datetime | None = None,
    dim: int = 64,
    since: datetime | None = None,
) -> int:
    """Watermark-bracketed delta sync.  Returns number of upserted rows.

    ``since`` overrides the stored watermark (the reference's
    ``rwv sync --since``, main.py:24-44 / jobs/incremental.py:37-51);
    when omitted, the last stored sync state brackets the delta.  The
    ``updated_after`` filter is applied post-parse here; against the
    real API it's pushed into the request (S3, core/readwise.py:47-49) —
    same predicate, different pushdown boundary.
    """
    watermark = since if since is not None else get_sync_state(spark, state_path, SERVICE)
    parsed = parse_export(read_export_json(spark, export_path)).filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    if watermark is not None:
        parsed = parsed.filter(F.col("updated_at") > F.lit(watermark))
    delta = _embed_parsed(parsed, dim)
    n = delta.count()
    if n:
        # snapshot-to-snapshot merge: the plan reads version N and commits
        # N+1 (different directories), so the MERGE stays fully distributed
        # and a crash mid-write leaves the manifest on N — no driver
        # materialization, no lost table
        VersionedTable(table_path).merge(spark, delta, "id")
    update_sync_state(spark, state_path, SERVICE, now)
    return n


def run_streaming_sync(
    spark: SparkSession,
    export_dir: str,
    table_path: str,
    checkpoint_dir: str,
    dim: int = 64,
) -> None:
    """G2 in its Structured-Streaming form: ``readStream`` over export
    dumps + ``foreachBatch`` merge (SURVEY §2.6 G2 — "or Structured
    Streaming with foreachBatch(merge)").

    The checkpoint directory replaces the sync_state watermark table:
    files already processed are never re-read, so each run ingests only
    the delta — ``trigger(availableNow=True)`` drains pending files and
    stops, giving incremental batch semantics from a streaming plan; in
    production the same query simply runs continuously.

    ``table_path`` is a VersionedTable root: each micro-batch merge is a
    pure distributed plan reading snapshot N and committing snapshot N+1
    (no driver materialization — sources/versioned.py).
    """
    from readwise_vector_db_spark.operators.upsert import dedup_updates
    from readwise_vector_db_spark.sources.readwise_export import EXPORT_SCHEMA
    from readwise_vector_db_spark.sources.versioned import VersionedTable

    raw = spark.readStream.schema(EXPORT_SCHEMA).json(export_dir)
    parsed = parse_export(raw).filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    delta = _embed_parsed(parsed, dim)
    table = VersionedTable(table_path)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = dedup_updates(batch_df, "id", "updated_at")
        table.merge(batch_df.sparkSession, batch, "id")

    q = (
        delta.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
