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
