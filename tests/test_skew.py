"""Salted join ≡ plain join, under heavy key skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed_sides(spark):
    # 90% of the fact rows share key 0 — the pathological shuffle case
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 10_000, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    return fact, dim


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_plain(spark, skewed_sides):
    fact, dim = skewed_sides
    plain = fact.join(dim, "k", "inner").select("k", "payload", "attr")
    salted = salted_join(fact, dim, "k", n_salts=8).select("k", "payload", "attr")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_keeps_unmatched(spark, skewed_sides):
    fact, dim = skewed_sides
    dim_holes = dim.filter(F.col("k") % 100 == 0)
    plain = fact.join(dim_holes, "k", "left").select("k", "payload", "attr")
    salted = salted_join(fact, dim_holes, "k", n_salts=4, how="left").select(
        "k", "payload", "attr"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_rejects_right(skewed_sides):
    fact, dim = skewed_sides
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="right")


def test_aqe_splits_skewed_sort_merge_join(spark):
    """With broadcast disabled and skew thresholds scaled to fixture size,
    AQE must mark the hot-key sort-merge join skew=true in the FINAL plan
    — the runtime complement to salted_join's by-construction fix."""
    import contextlib
    import io

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 200_000, 20).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = left.join(right, "k")
        assert len(joined.collect()) == 200_000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE did not split the skewed join:\n{plan}"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
