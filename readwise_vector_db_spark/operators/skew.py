"""Skew mitigation: salted equi-join.

A shuffle join hashes rows to reducers by key; one hot key (the empty
document, a null-ish sentinel id, a viral item) lands its entire volume
on ONE reducer and the stage runs at straggler speed.  AQE's skew-join
splitting (enabled in session.py) repairs this at runtime for sort-merge
joins; salting prevents it by construction and also covers the cases AQE
misses (aggregations feeding the join, broadcast-ineligible sides).

Mechanics: the skewed side gets a uniform random salt in [0, n); the
other side is replicated n× (one row per salt value); the join key
becomes (key, salt), spreading each hot key over n reducers.  Join
results are identical to the unsalted join for any salt assignment —
verified in tests/test_skew.py.

Cost model: replication multiplies the small side's shuffle volume by n
— pick n ≈ (hot-key volume / target partition size), not "as big as
possible".  For joins where BOTH sides are huge and skewed, salt only
the hot keys (split-and-union: skewed keys through the salted path,
the long tail through a plain join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the skewed side salted and ``other`` replicated
    ``n_salts``×.  Supports inner/left joins (the shapes where the skewed
    side's rows must all survive)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn(SALT_COL, (F.rand(seed) * n_salts).cast("int"))
    o = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = s.join(o, keys + [SALT_COL], how)
    return joined.drop(SALT_COL)
