"""Bucketed-table joins are shuffle-free (co-located layout)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.sources.tables import load_table, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(orders, "orders_b", str(tmp_path / "ob"), "o_custkey")
    write_bucketed(customer, "customer_b", str(tmp_path / "cb"), "c_custkey")
    try:
        ob, cb = spark.table("orders_b"), spark.table("customer_b")
        joined = ob.join(cb, ob["o_custkey"] == cb["c_custkey"]).select(
            "o_orderkey", "c_name"
        )
        plan = _physical_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # same join on the raw (unbucketed) parquet must shuffle both sides
        raw = orders.join(customer, orders["o_custkey"] == customer["c_custkey"]).select(
            "o_orderkey", "c_name"
        )
        assert "Exchange" in _physical_plan(raw)
        # and the results agree
        assert joined.count() == raw.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
