"""Z-order layout: key math, read-equivalence, and measured row-group
pruning (sources/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.sources import layout as L


def test_zorder_key_interleaves_bits(spark):
    # bits=2, two columns spanning [0, 3]: bucket == value, and the
    # Morton key interleaves col0 at even bits, col1 at odd bits
    df = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4)], "a int, b int"
    )
    rows = df.select(
        "a", "b", L.zorder_key(["a", "b"], [0, 0], [3, 3], bits=2)
    ).collect()
    for r in rows:
        a, b = r["a"], r["b"]
        want = (
            (a & 1)
            | ((b & 1) << 1)
            | (((a >> 1) & 1) << 2)
            | (((b >> 1) & 1) << 3)
        )
        assert r["_z"] == want, (a, b)


def test_zorder_key_handles_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, 5), (0, 5)], "a int, b int"
    )
    rows = df.select(L.zorder_key(["a", "b"], [0, 5], [3, 5], bits=2)).collect()
    zs = [r["_z"] for r in rows]
    assert zs[0] == 0  # null -> origin
    assert all(z >= 0 for z in zs)


def test_zorder_key_rejects_bad_widths():
    with pytest.raises(ValueError):
        L.zorder_key([], [], [])
    with pytest.raises(ValueError):
        L.zorder_key(["a", "b"], [0, 0], [1, 1], bits=32)


def test_write_zordered_preserves_content(spark, tmp_path):
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).alias("v"),
        (F.col("id") % 7).alias("tag"),
    )
    path = str(tmp_path / "zt")
    L.write_zordered(df, path, ["k", "v"], bits=8, num_files=4)
    back = spark.read.parquet(path)
    assert back.columns == ["k", "v", "tag"]  # key column dropped
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_zorder_prunes_both_columns(spark, tmp_path):
    """The point of the layout, measured from footers: a single-column
    sort prunes only its own column; z-order prunes BOTH."""
    n = 40_000
    df = spark.range(n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)) % 10_000).alias("x"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(0x7FFFFFFF)) % 10_000).alias(
            "y"
        ),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    L.write_zordered(df, zpath, ["x", "y"], bits=10, num_files=8, rowgroup_bytes=1 << 14)
    # the comparison layout gets the same dense boundary sampling the
    # operator uses — the default 100-point sampler's seed varies with
    # session history and rarely draws degenerate range boundaries,
    # which reads as a pruning collapse unrelated to what's under test
    conf_key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(conf_key, "100")
    try:
        spark.conf.set(conf_key, "1000")
        (
            df.repartitionByRange(8, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .option("parquet.block.size", 1 << 14)
            .parquet(spath)
        )
    finally:
        spark.conf.set(conf_key, old)
    zr = L.rowgroup_ranges(zpath, ["x", "y"])
    sr = L.rowgroup_ranges(spath, ["x", "y"])
    assert len(zr) > 8 and len(sr) > 8  # rowgroup knob took effect
    # a 5%-wide box on each dimension
    zx, zy = (
        L.pruned_fraction(zr, "x", 4000, 4500),
        L.pruned_fraction(zr, "y", 4000, 4500),
    )
    sx, sy = (
        L.pruned_fraction(sr, "x", 4000, 4500),
        L.pruned_fraction(sr, "y", 4000, 4500),
    )
    # the sorted column prunes ~perfectly.  Threshold is quantized by
    # rowgroup count: the range sampler's boundaries (seeded by session
    # history via rdd.id) can land one extra straddling rowgroup on the
    # query box, which at ~20 groups steps the fraction by 0.05 — the
    # old `> 0.9` flaked at exactly 0.9 once in several full-suite runs
    assert sx >= 0.85

    assert sy == 0.0  # the other column prunes nothing
    assert zx > 0.5 and zy > 0.5  # z-order prunes BOTH


def test_depth_bucketing_preserves_content(spark, tmp_path):
    df = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 500).alias("v")
    )
    path = str(tmp_path / "zd")
    L.write_zordered(df, path, ["k", "v"], bits=6, num_files=4, bucketing="depth")
    back = spark.read.parquet(path)
    assert back.columns == ["k", "v"]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_depth_bucketing_beats_width_under_outlier_skew(spark, tmp_path):
    """The textbook equi-width failure: 95% of x-values live in
    [0, 1000) but rare outliers stretch the range to ~1e9, so the
    equi-width grid puts the ENTIRE bulk into bucket 0 and selective
    predicates inside the bulk prune nothing on x.  Equi-depth
    (quantile) buckets spread the bulk across the grid and the same
    predicate prunes most row groups."""
    n = 40_000
    base = spark.range(n).select(
        F.when(
            F.col("id") % 20 == 0,
            F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)) % 1_000_000_000,
        )
        .otherwise(F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)) % 1_000)
        .alias("x"),
        (F.xxhash64("id", F.lit(2)).bitwiseAND(F.lit(0x7FFFFFFF)) % 10_000).alias("y"),
    )
    wpath, dpath = str(tmp_path / "w"), str(tmp_path / "d")
    for path, mode in ((wpath, "width"), (dpath, "depth")):
        L.write_zordered(
            base, path, ["x", "y"], bits=8, num_files=4,
            rowgroup_bytes=1 << 14, bucketing=mode,
        )
    wr = L.rowgroup_ranges(wpath, ["x", "y"])
    dr = L.rowgroup_ranges(dpath, ["x", "y"])
    # a 5%-wide slice INSIDE the bulk value range
    w_bulk = L.pruned_fraction(wr, "x", 400, 450)
    d_bulk = L.pruned_fraction(dr, "x", 400, 450)
    assert d_bulk > w_bulk + 0.3, (w_bulk, d_bulk)
    # and the depth layout still prunes the second column
    assert L.pruned_fraction(dr, "y", 4000, 4500) > 0.3
