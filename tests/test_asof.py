"""As-of join semantics: backward match, inclusive bound, no-match NULLs."""

from __future__ import annotations

from readwise_vector_db_spark.operators.asof import asof_join


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 18, "t"), (2, 15, "c"), (3, 7, "d")],
        "uid INT, ts INT, ev STRING",
    )
    right = spark.createDataFrame(
        [(1, 5, "v1"), (1, 18, "v2"), (2, 99, "v3")],
        "uid INT, ts INT, ver STRING",
    )
    out = {
        (r["uid"], r["ts"]): r["ver"]
        for r in asof_join(
            left, right, key="uid", left_ts="ts", right_ts="ts", payload=["ver"]
        ).collect()
    }
    assert out[(1, 10)] == "v1"   # latest right ≤ 10
    assert out[(1, 18)] == "v2"   # equal ts matches (inclusive >=)
    assert out[(1, 20)] == "v2"
    assert out[(2, 15)] is None   # right row is in the future
    assert out[(3, 7)] is None    # key absent from right


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(100).selectExpr("id % 5 AS uid", "id AS ts", "id AS x")
    right = spark.range(10).selectExpr("id % 5 AS uid", "id * 7 AS ts", "id AS v")
    out = asof_join(left, right, key="uid", payload=["v"])
    assert out.count() == 100
    assert set(out.columns) == {"uid", "ts", "x", "v"}


def test_asof_null_keys_never_match(spark):
    """r10 (caught by the NULL-planted oracle fixture): SQL ASOF
    equality never matches NULL keys — a NULL-key left row carries a
    NULL payload even when NULL-key right rows exist, and NULL-key
    right rows match nothing; non-NULL keys are unaffected."""
    from readwise_vector_db_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, 7, 30)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(None, 5, 100), (7, 25, 200)],
        "user_id long, ts long, cp_id long",
    )
    out = {
        r["event_id"]: r["cp_id"]
        for r in asof_join(left, right, key="user_id", payload=["cp_id"]).collect()
    }
    assert out == {1: None, 2: None, 3: 200}


def test_asof_null_timestamps_never_match(spark):
    """r10 review: SQL `left.ts >= right.ts` is never true when either
    side's ts is NULL — a NULL-ts right row must not attach its payload
    (window NULLS-FIRST would otherwise hand it to EVERY row of its
    key), and a NULL-ts left row matches nothing."""
    from readwise_vector_db_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 7, 30), (2, 7, None)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(7, None, 100), (7, 25, 200)],
        "user_id long, ts long, cp_id long",
    )
    out = {
        r["event_id"]: r["cp_id"]
        for r in asof_join(left, right, key="user_id", payload=["cp_id"]).collect()
    }
    assert out == {1: 200, 2: None}
