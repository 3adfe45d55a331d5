"""Watermark control table (reference ``models/sync_state.py:7-11``,
upsert ``db/upsert.py:95-135``, read ``db/upsert.py:19-26``).

One row per service: (service STRING, last_synced_at TIMESTAMP).  Tiny
table → a single-file parquet dir the driver reads as a scalar; the
incremental job (jobs/incremental.py analogue) brackets each run with
``get`` → scan(updated_after) → merge → ``set``.

In Structured Streaming the same role is played by the checkpoint dir;
this table exists for batch-incremental runs and for parity with the
reference's explicit watermark.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("service", T.StringType(), False),
        T.StructField("last_synced_at", T.TimestampType(), False),
    ]
)


def get_sync_state(spark: SparkSession, path: str, service: str) -> datetime | None:
    try:
        df = spark.read.schema(SCHEMA).parquet(path)
    except Exception:  # noqa: BLE001 — table not created yet
        return None
    row = df.filter(F.col("service") == service).select("last_synced_at").first()
    return row[0] if row else None


def update_sync_state(
    spark: SparkSession, path: str, service: str, ts: datetime | None = None
) -> datetime:
    """Upsert (service, ts) — the S6 watermark sink."""
    ts = ts or datetime.now(timezone.utc).replace(tzinfo=None)
    new = spark.createDataFrame([(service, ts)], SCHEMA)
    try:
        existing = spark.read.schema(SCHEMA).parquet(path).filter(
            F.col("service") != service
        )
        merged = new.unionByName(existing)
    except Exception:  # noqa: BLE001
        merged = new
    rows = merged.collect()
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    return ts
