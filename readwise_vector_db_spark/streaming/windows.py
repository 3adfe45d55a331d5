"""Structured Streaming operators over the events stream.

The reference's only streaming constructs are the ``updated_after``
watermark (G2) and per-result SSE/NDJSON framing (S8).  The Spark
generalization (north-star, SURVEY §2.7): real event-time windows with
watermarked late-data handling.

Each builder takes a *streaming* DataFrame (``spark.readStream``) and
returns the windowed aggregation; the batch twins in
suites/relational.py (``q_events_hourly`` / ``q_events_sessions``) run
the same logical plan through the oracle gate, so the streaming tests
only need to assert stream≡batch equivalence on a bounded input.

Scale notes: state lives in the state store keyed by (window,
event_type) / session key; the watermark bounds state size — without it
a 100 TB stream accumulates unbounded session state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from readwise_vector_db_spark.functions.timeops import epoch_s


def _bucket_s(col: str) -> F.Column:
    """Window-boundary LTZ timestamp → tz-free wall-clock epoch seconds.

    The scan coerced the fixture's NTZ wall time into an instant through
    the session timezone (LTZ is the price of watermark support); casting
    back to NTZ applies the inverse session-tz conversion, recovering the
    original wall clock, and ``timeops.epoch_s`` extracts its epoch with
    no timezone term — so stream output matches the batch twins
    (``q_events_hourly``/``q_events_sliding``/``q_events_sessions``) in
    any session timezone, not just UTC.  (Caveat: with a
    fractional-hour session offset the LTZ window *boundaries* themselves
    shift off wall-clock hours — inherent to instant-based windowing.)
    """
    return epoch_s(F.col(col).cast("timestamp_ntz"))

# ts must be LTZ TimestampType: Spark watermarks reject TIMESTAMP_NTZ
# (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so the NTZ fixture wall time is
# read as a session-tz instant here.  ``_bucket_s`` undoes that shift at
# the output boundary so emitted buckets match the NTZ batch twins.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-source stream (tests); swap for kafka in production — the
    downstream plan is identical."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window with late-data watermark — streaming twin
    of q_events_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            _bucket_s("window.start").alias("bucket"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding window: per-type event rate over overlapping windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            _bucket_s("window.start").alias("bucket"),
            "event_type",
            "n",
        )
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (built-in session_window — the streaming
    twin of the batch lag+cumsum sessionizer in suites/relational.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            _bucket_s("session_window.start").alias("start_s"),
            _bucket_s("session_window.end").alias("end_s"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Exact first-seen dedup ON THE STREAM with BOUNDED state.

    ``dropDuplicatesWithinWatermark`` evicts a key's state once the
    watermark passes its event time — plain ``dropDuplicates(keys)``
    without the event-time column in the key subset never evicts, so its
    state store grows forever on a long-running stream and would OOM at
    100 TB.  The trade is the documented streaming-dedup contract:
    duplicates are only guaranteed suppressed when they arrive within
    the watermark delay of the first occurrence, which is exactly the
    late-data bound the pipeline already promises.  The in-flight half
    of the dedup story; the batch operators live in operators/dedup.py.
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain a bounded file-source stream into an in-memory table
    synchronously (complete mode) — the test harness for every builder."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
