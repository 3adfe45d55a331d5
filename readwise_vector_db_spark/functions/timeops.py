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

    Derived from the single µs extraction: ``pmod`` rounds the µs count
    down to the second boundary (floor semantics for pre-1970 times with
    sub-second parts, where plain SECOND truncation rounds toward zero:
    1969-12-31 23:59:59.5 → −1 floored, not 0), and the division is then
    exact — the floored µs count is a multiple of 10⁶ representable
    exactly in a double for |ts| within ±2^53 µs (≈ year 285), so the
    quotient is the exact integer.  One ``timestamp_diff`` and no branch
    vs the earlier trunc-plus-correction form (the per-row cost the r3
    events-window bench regression pointed at).  Equals
    ``floor(DuckDB epoch(ts))`` — DuckDB's ``epoch()`` itself returns a
    fractional DOUBLE, so compare against its floor, not it.
    """
    us = epoch_us(col)
    return ((us - F.pmod(us, F.lit(1_000_000))) / F.lit(1_000_000)).cast("long")


def hour_bucket_s(col: Column | str) -> Column:
    """Epoch seconds of the enclosing hour (== DuckDB
    epoch(time_bucket(INTERVAL 1 HOUR, ts))) — integer remainder math on
    the tz-free epoch, not date_trunc, which round-trips through the
    session timezone for NTZ input.  ``pmod`` (not ``%``, which takes the
    dividend's sign) keeps the bucket a floor for pre-1970 times, matching
    DuckDB's time_bucket (1969-12-31 23:30 → −3600, not 0)."""
    s = epoch_s(col)
    return s - F.pmod(s, F.lit(3600))
