"""Binned range join: equivalence with the naive nested-loop semantics,
bin-boundary edges, and the plan guarantee (hash join, not BNLJ)."""

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.operators.rangejoin import (
    binned_range_join,
    interval_overlap_join,
)


@pytest.fixture(scope="module")
def points(spark):
    # includes points exactly on interval ends and on bin boundaries
    vals = [0, 1, 9, 10, 11, 19, 20, 21, 35, 99, 100, 101, -5, -10, -11]
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "pid int, p long")


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [(0, 0, 10), (1, 10, 20), (2, 5, 35), (3, 95, 105), (4, -12, -8), (5, 200, 210)]
    return spark.createDataFrame(rows, "iid int, lo long, hi long")


def _naive(points, intervals):
    return points.crossJoin(intervals).filter(
        (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
    )


@pytest.mark.parametrize("bin_width", [1, 7, 10, 1000])
def test_inner_matches_naive(points, intervals, bin_width):
    got = binned_range_join(points, intervals, "p", "lo", "hi", bin_width)
    want = _naive(points, intervals)
    key = lambda r: (r["pid"], r["iid"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_left_keeps_unmatched_points(points, intervals):
    got = binned_range_join(points, intervals, "p", "lo", "hi", 10, how="left")
    n_matched = _naive(points, intervals).count()
    n_unmatched_points = points.join(
        _naive(points, intervals).select("pid").distinct(), "pid", "left_anti"
    ).count()
    assert got.count() == n_matched + n_unmatched_points
    nulls = got.filter(F.col("iid").isNull())
    assert nulls.count() == n_unmatched_points


def test_interval_overlap_matches_naive(spark, intervals):
    right = spark.createDataFrame(
        [(10, 8, 12), (11, 30, 40), (12, -20, -13), (13, 104, 300)],
        "rid int, rlo long, rhi long",
    )
    got = interval_overlap_join(intervals, right, "lo", "hi", "rlo", "rhi", 10)
    want = intervals.crossJoin(right).filter(
        (F.col("lo") <= F.col("rhi")) & (F.col("rlo") <= F.col("hi"))
    )
    key = lambda r: (r["iid"], r["rid"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_plan_is_hash_join_not_nested_loop(points, intervals):
    plan = binned_range_join(
        points, intervals, "p", "lo", "hi", 10
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_rejects_unknown_how(points, intervals):
    with pytest.raises(ValueError):
        binned_range_join(points, intervals, "p", "lo", "hi", 10, how="full")
