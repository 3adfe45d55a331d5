import math

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        (2, [1.0, 2.0, 2.0], [1.0, 2.0, 2.0]),
        (3, [1.0, 1.0, 0.0], [2.0, 2.0, 0.0]),
        (4, None, [1.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "id int, a array<double>, b array<double>")


def _collect(df, col):
    return {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}


def test_dot(vec_df):
    out = _collect(vec_df, dot("a", "b"))
    assert out[1] == 0.0
    assert out[2] == 9.0
    assert out[3] == 4.0
    assert out[4] is None


def test_l2_norm(vec_df):
    out = _collect(vec_df, l2_norm("a"))
    assert out[2] == 3.0
    assert out[3] == pytest.approx(math.sqrt(2))


def test_cosine_similarity_and_distance(vec_df):
    sim = _collect(vec_df, cosine_similarity("a", "b"))
    assert sim[1] == 0.0
    assert sim[2] == pytest.approx(1.0)
    assert sim[3] == pytest.approx(1.0)
    assert sim[5] is None  # zero vector: no direction, not an error
    dist = _collect(vec_df, cosine_distance("a", "b"))
    assert dist[1] == 1.0
    assert dist[2] == pytest.approx(0.0, abs=1e-12)


def test_l2_normalize_zero_vector_is_null(vec_df):
    out = _collect(vec_df, l2_normalize("a"))
    assert out[5] is None  # zero vector has no direction
    assert out[2] == pytest.approx([1 / 3, 2 / 3, 2 / 3])


def test_precomputed_norm_matches_inline(vec_df):
    df = vec_df.filter(F.col("id") == 3).withColumn("na", l2_norm("a"))
    with_norm = df.select(
        cosine_distance("a", "b", a_norm=F.col("na")).alias("v")
    ).first()["v"]
    inline = df.select(cosine_distance("a", "b").alias("v")).first()["v"]
    assert with_norm == inline


def test_fp16_pack_roundtrip(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from readwise_vector_db_spark.functions.vector import pack_fp16, unpack_fp16

    vals = [([0.1, -2.5, 1000.25, 0.0],), (None,)]
    df = spark.createDataFrame(vals, "v: array<float>")
    packed = df.withColumn("b", pack_fp16()(F.col("v")))
    out = packed.withColumn("back", unpack_fp16()(F.col("b"))).collect()
    by_null = {r["v"] is None: r for r in out}
    assert by_null[True]["b"] is None and by_null[True]["back"] is None
    r = by_null[False]
    assert len(r["b"]) == 8  # 4 floats × 2 bytes: storage halved
    np.testing.assert_allclose(r["back"], r["v"], rtol=1e-3)


def test_with_backoff_retries_then_succeeds():
    from readwise_vector_db_spark.functions.embedder import with_backoff

    calls, delays = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert with_backoff(flaky, sleep=delays.append) == "ok"
    assert len(calls) == 3
    assert delays == [1.0, 2.0]  # exponential: 1s then 2s


def test_with_backoff_exhausts_and_reraises():
    import pytest

    from readwise_vector_db_spark.functions.embedder import with_backoff

    delays = []

    def always_fails():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        with_backoff(always_fails, retries=3, sleep=delays.append)
    assert delays == [1.0, 2.0]  # retries-1 sleeps
