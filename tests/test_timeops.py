"""timeops floor semantics — DuckDB-compatible across the whole timeline."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions.timeops import epoch_s, epoch_us, hour_bucket_s

_TIMES = [
    "2024-06-01 12:34:56.789",
    "1970-01-01 00:00:00",
    "1970-01-01 00:00:00.5",
    "1969-12-31 23:59:59.5",   # truncation would give 0; floor gives -1
    "1969-12-31 23:30:00",     # % would bucket to 0; floor buckets to -3600
    "1969-01-15 07:08:09.25",
]


def _spark_rows(spark):
    df = spark.createDataFrame([(t,) for t in _TIMES], "t string").select(
        F.col("t"),
        epoch_us(F.col("t").cast("timestamp_ntz")).alias("us"),
        epoch_s(F.col("t").cast("timestamp_ntz")).alias("s"),
        hour_bucket_s(F.col("t").cast("timestamp_ntz")).alias("hb"),
    )
    return {r["t"]: r for r in df.collect()}


def test_epoch_floor_matches_duckdb_everywhere(spark):
    got = _spark_rows(spark)
    con = duckdb.connect()
    for t in _TIMES:
        us, es, hb = con.execute(
            f"""SELECT epoch_us(TIMESTAMP '{t}'),
                       CAST(floor(epoch(TIMESTAMP '{t}')) AS BIGINT),
                       CAST(epoch(time_bucket(INTERVAL 1 HOUR, TIMESTAMP '{t}')) AS BIGINT)"""
        ).fetchone()
        assert got[t]["us"] == us, t
        assert got[t]["s"] == es, t
        assert got[t]["hb"] == hb, t


def test_pre_epoch_values_explicitly(spark):
    got = _spark_rows(spark)
    assert got["1969-12-31 23:59:59.5"]["s"] == -1
    assert got["1969-12-31 23:30:00"]["hb"] == -3600
    assert got["1970-01-01 00:00:00.5"]["s"] == 0
