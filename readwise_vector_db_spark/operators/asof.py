"""As-of (temporal) join — an operator Spark lacks as a builtin.

For each left row, attach the most recent right row whose timestamp is
≤ the left row's timestamp, per key (DuckDB/kdb ``ASOF JOIN``
semantics, ``direction='backward'``).

Spark-native decomposition (no per-key Python, no range cross-join):

1. union both sides into one stream tagged by origin, right-side payload
   carried as a struct (NULL on left rows);
2. one window per key ordered by (ts, origin) — right rows sort BEFORE
   left rows at equal timestamps, giving the inclusive ``>=`` bound —
   taking ``last(payload, ignorenulls=True)`` over rows unbounded
   preceding → current;
3. keep the left rows; their carried payload IS the as-of match.

Cost: exactly one shuffle (the window partitioning on key) — same as
any equi-join on the key, and strictly cheaper than the naive
range-join + groupBy-max plan, which shuffles the cross product.  Hot
keys: salt via operators/skew.py, or pre-bucket both inputs by key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_ORIGIN = "__asof_origin"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every ``left`` row + ``payload`` columns from the
    latest ``right`` row with ``right.ts <= left.ts`` on the same key
    (NULLs when no prior right row exists).

    ``right`` should be unique per (key, ts) — with duplicates, which
    one wins is unspecified (dedupe first, e.g. groupBy(key, ts).max).
    """
    payload = list(payload)
    if not payload:
        raise ValueError("asof_join needs at least one payload column")
    missing = [c for c in payload if c not in right.columns]
    if missing:
        raise ValueError(f"payload columns not in right side: {missing}")
    rtypes = dict(right.dtypes)
    payload_t = "struct<" + ", ".join(f"{c}: {rtypes[c]}" for c in payload) + ">"
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_ORIGIN),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(payload_t).alias(_PAYLOAD),
    )
    # SQL join semantics for NULL keys AND NULL timestamps (round 10 —
    # caught by the NULL-planted oracle fixture + review): the window
    # decomposition would otherwise (a) put every NULL-key row in ONE
    # partition and match NULL-key left rows to NULL-key right rows,
    # where DuckDB/kdb ASOF equality never matches NULL, and (b) sort a
    # NULL-ts right row FIRST (asc NULLS FIRST) so its payload attached
    # to every row of its key, where SQL's ``left.ts >= right.ts`` is
    # never true for NULL.  Dropping NULL-key/NULL-ts RIGHT rows
    # restores both exactly: such left rows still flow through (left
    # join) and carry a NULL payload — a NULL-ts LEFT row then sorts
    # before every surviving right row of its key, so it matches
    # nothing, again the SQL answer.
    r_tag = right.filter(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_ORIGIN),
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
        F.struct(*[F.col(c) for c in payload]).alias(_PAYLOAD),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        W.partitionBy("__k")
        .orderBy(F.asc("__ts"), F.asc(_ORIGIN))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = carried.filter(F.col(_ORIGIN) == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload],
    )
    return out
