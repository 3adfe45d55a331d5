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


def test_hot_cell_split_pairs_identical(spark):
    """The BLAS pair scorer's hot-cell split (round 7): a cell past
    max_cell_rows salts into block-pair groups, and the PAIR SET must be
    identical to the unsplit path — every within-cell pair exactly once,
    no cross-cell pair ever.  Corpus plants 50 % of vectors in one cell
    (a near-identical blob) so the split actually engages."""
    import numpy as np

    from readwise_vector_db_spark.operators.dedup import semantic_dedup_pairs

    rng = np.random.default_rng(11)
    rows = []
    # hot blob: 120 vectors within 1e-3 of one direction → one cell,
    # all pairwise near-dups
    hub = rng.standard_normal(8)
    for i in range(120):
        rows.append((i, [float(x) for x in hub + 1e-3 * rng.standard_normal(8)]))
    # cold spread: 120 more across random directions
    for i in range(120, 240):
        rows.append((i, [float(x) for x in rng.standard_normal(8)]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(threshold=0.999, n_clusters=4, seed=7)
    unsplit = semantic_dedup_pairs(embs, max_cell_rows=1_000_000, **kw)
    split = semantic_dedup_pairs(embs, max_cell_rows=16, **kw)  # forces s≥8
    a = sorted((r["id_a"], r["id_b"], r["cos_sim"]) for r in unsplit.collect())
    b = sorted((r["id_a"], r["id_b"], r["cos_sim"]) for r in split.collect())
    assert a == b
    assert len(a) >= 120 * 119 // 2 * 0.9  # the hot blob really paired


def test_hot_cell_split_bounds_group_rows(spark):
    """Per-group row counts under the split: no pandas group ever holds
    more than 2×max_cell_rows rows (one block pair), even when one cell
    owns half the corpus."""
    import numpy as np

    from readwise_vector_db_spark.operators.dedup import (
        _within_cell_candidates_blas,
    )
    from readwise_vector_db_spark.operators.similarity import assign_cells

    rng = np.random.default_rng(13)
    hub = rng.standard_normal(8)
    rows = [
        (i, [float(x) for x in hub + 1e-3 * rng.standard_normal(8)])
        for i in range(200)
    ]
    embs = spark.createDataFrame(rows, "id long, v array<double>")
    # one planted centroid = everything lands in ONE cell
    assigned = assign_cells(embs, [(0, [float(x) for x in hub])], vec_col="v")
    cap = 32
    # reproduce the split's grouping and check the per-group bound
    from pyspark.sql import functions as F

    from readwise_vector_db_spark.operators.dedup import hash64

    sizes = assigned.groupBy("cluster").agg(
        F.ceil(F.count("*") / F.lit(cap)).cast("int").alias("_s")
    )
    t = F.pmod(hash64(F.col("id").cast("string"), "xxhash64"), F.col("_s")).cast("int")
    grouped = (
        assigned.join(F.broadcast(sizes), "cluster")
        .withColumn("_t", t)
        .withColumn(
            "_g",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("_s") - 1),
                    lambda u: F.struct(
                        F.least(F.col("_t"), u).alias("t1"),
                        F.greatest(F.col("_t"), u).alias("t2"),
                    ),
                )
            ),
        )
        .groupBy("cluster", "_g.t1", "_g.t2")
        .count()
    )
    counts = [r["count"] for r in grouped.collect()]
    assert max(counts) <= 2 * cap + cap  # hash imbalance slack on tiny n
    # and the real scorer still emits the full pair set through it
    cand = _within_cell_candidates_blas(assigned, 0.999, max_cell_rows=cap)
    assert cand.count() == 200 * 199 // 2
