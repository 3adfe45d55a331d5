"""Replicate a fixture scale-factor directory N× with key remapping.

Usage: python tools/make_sfx.py <src_sf_dir> <out_dir> [N]

Produces a join-consistent corpus N× the source: every key column is
offset per copy by ``i * stride``.  The stride is a SINGLE round power
of ten above the max key across ALL remapped tables — key domains span
tables (o_custkey ↔ c_custkey, l_partkey ↔ p_partkey, …), so a
per-table stride would shift the two sides of an FK pair by different
amounts and leave every copy i ≥ 1 dangling.  With one global stride,
copy i's lineitem rows join copy i's orders/customer/part/supplier
rows exactly, and join cardinalities grow linearly.  Shared small
dimensions (region, nation) keep a single copy, and the foreign keys
into them are left unmapped.  Timestamps are untouched (the time domain
is the same; density grows N×, which is what a bigger day of events
looks like).

Purpose: scaling evidence BEYOND the driver fixtures (SCALING.md's
sf≈1 datapoints) — fixture inputs for correctness stay the driver's
own parquet, untouched.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# key columns offset per copy; FKs into the shared dims (nation, region)
# deliberately absent so every copy joins the same dimension rows.
REMAP: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def _global_stride(spark: SparkSession, src: str) -> int:
    """One stride for every key domain: pow10 above the max key over all
    remapped tables.  Key domains cross tables (o_custkey must stay
    aligned with c_custkey under the same copy offset), so the stride
    must be shared — never computed per table."""
    mx = 0
    for name, keys in REMAP.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        maxes = [F.max(k) for k in keys]
        agg = maxes[0] if len(maxes) == 1 else F.greatest(*maxes)
        m = df.select(agg.alias("m")).first()["m"] or 0
        mx = max(mx, int(m))
    s = 10
    while s <= mx:
        s *= 10
    return s


def replicate(spark: SparkSession, src: str, out: str, n: int) -> None:
    os.makedirs(out, exist_ok=True)
    stride = _global_stride(spark, src)
    for name in SHARED:
        spark.read.parquet(f"{src}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    for name, keys in REMAP.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        copies = [
            df.select(
                *[
                    (F.col(c) + F.lit(i * stride)).alias(c) if c in keys else F.col(c)
                    for c in df.columns
                ]
            )
            for i in range(n)
        ]
        outdf = copies[0]
        for c in copies[1:]:
            outdf = outdf.unionByName(c)
        # many even splits so downstream scans parallelize without the
        # small-input repartition branch
        outdf.repartition(32).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{n} stride={stride}")


if __name__ == "__main__":
    src, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from readwise_vector_db_spark.session import get_spark

    replicate(get_spark("make_sfx"), src, out, n)
    print("done ->", out)
