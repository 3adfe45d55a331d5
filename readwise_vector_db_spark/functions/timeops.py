"""Timezone-free epoch extraction for TIMESTAMP_NTZ event time.

The fixture ``events.ts`` is parquet ``TIMESTAMP(MICROS, isAdjustedToUTC
=false)`` — Spark reads it as TIMESTAMP_NTZ, DuckDB as a naive
TIMESTAMP, and both see the identical wall-clock value.  The one trap is
epoch extraction: ``unix_timestamp``/``unix_micros`` coerce NTZ to LTZ
through the SESSION TIMEZONE first (and ``unix_micros`` rejects NTZ
outright), so the emitted number would depend on whichever timezone the
caller's SparkSession happens to run in.  DuckDB's ``epoch_us(naive)``
has no such dependence — it treats the wall time as UTC.

These helpers reproduce DuckDB's semantics exactly with an explicit
NTZ-to-NTZ ``timestamp_diff`` against the epoch: no LTZ coercion, no
session-timezone term, bit-identical across engines and across sessions
configured with any timezone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _epoch_ntz() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def _as_col(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch of an NTZ wall time (== DuckDB epoch_us)."""
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), _as_col(col))


def epoch_s(col: Column | str) -> Column:
    """FLOOR whole seconds since epoch of an NTZ wall time.

    ``timestamp_diff("SECOND", …)`` truncates toward zero, which differs
    from floor for pre-1970 times with sub-second parts (1969-12-31
    23:59:59.5 → 0 truncated vs −1 floored); the correction term keeps
    floor semantics across the whole timeline, all in exact integer math.
    Equals ``floor(DuckDB epoch(ts))`` — DuckDB's ``epoch()`` itself
    returns a fractional DOUBLE, so compare against its floor, not it.
    """
    c = _as_col(col)
    s_trunc = F.timestamp_diff("SECOND", _epoch_ntz(), c)
    us = epoch_us(c)
    return s_trunc - F.when(us < s_trunc * F.lit(1_000_000), F.lit(1)).otherwise(F.lit(0))


def hour_bucket_s(col: Column | str) -> Column:
    """Epoch seconds of the enclosing hour (== DuckDB
    epoch(time_bucket(INTERVAL 1 HOUR, ts))) — integer remainder math on
    the tz-free epoch, not date_trunc, which round-trips through the
    session timezone for NTZ input.  ``pmod`` (not ``%``, which takes the
    dividend's sign) keeps the bucket a floor for pre-1970 times, matching
    DuckDB's time_bucket (1969-12-31 23:30 → −3600, not 0)."""
    s = epoch_s(col)
    return s - F.pmod(s, F.lit(3600))
