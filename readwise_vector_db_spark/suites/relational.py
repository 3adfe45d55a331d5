"""Relational operator surface: joins, aggregations, windows, set ops, events.

The reference has NO joins, aggregations, or window functions anywhere in
its engine (SURVEY §2.7 — the closest thing is the ingest-time book
denormalization, ``core/readwise.py:53-63``), but the north-star scope
requires the full relational surface.  Everything here is pure
DataFrame API — Catalyst provides pushdown, join selection, partial
aggregation, and ``TakeOrderedAndProject`` for free.

Scale notes per query are inline.  The common pattern for a 100 TB
lineitem: filters reach the parquet scan (PushedFilters), dimension
joins broadcast, fact-fact joins shuffle on the join key with AQE skew
handling, and every groupBy does map-side partial aggregation.

Cross-engine determinism: money aggregates cast each term to
DECIMAL(28,10) before SUM (exact, order-independent), then round and
cast back to DOUBLE.  Casting a double to decimal can never hit a
rounding tie (a binary double is never exactly x.5 at decimal scale 10),
so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions.timeops import epoch_s, epoch_us, hour_bucket_s
from readwise_vector_db_spark.registry import register, register_extra
from readwise_vector_db_spark.sources.tables import load_table

DEC = "decimal(28,10)"


def _dec_sum(col: Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM of a double expression, rounded to `scale`.

    Round the DECIMAL, then cast — not the reverse: Spark's
    ``round(double)`` rounds the SHORTEST decimal rendering (Java
    ``BigDecimal.valueOf``) while DuckDB rounds the exact binary value,
    so a decimal sum landing exactly on a ``.xx5`` boundary diverges by
    one unit-in-last-place after a double cast (observed at ×10 scale:
    a 1.9e9 revenue sum hit ...609.665 and split .67 vs .66).  Decimal
    HALF_UP rounding is exact and identical in both engines."""
    return F.round(F.sum(col.cast(DEC)), scale).cast("double").alias(alias)


def _dec_avg(col: Column, alias: str, scale: int = 6) -> Column:
    """AVG as exact decimal SUM / COUNT, both engines divide identical doubles."""
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / F.count(F.lit(1)), scale
    ).alias(alias)


_REVENUE = "l_extendedprice * (1 - l_discount)"


def _revenue() -> Column:
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q1: pricing summary — the canonical wide aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST({_REVENUE} AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST({_REVENUE} * (1 + l_tax) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → filter (pushed to parquet) → hash agg with map-side combine.

    At 100 TB this is the best case for Spark: 2 grouping keys of tiny
    cardinality mean partial aggregation collapses each input partition
    to ≤ 6 rows before the shuffle.
    """
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        parallelize=True,
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
        where=F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"),
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(_revenue(), "sum_disc_price"),
            _dec_sum(_revenue() * (F.lit(1) + F.col("l_tax")), "sum_charge"),
            _dec_avg(F.col("l_quantity"), "avg_qty"),
            _dec_avg(F.col("l_extendedprice"), "avg_price"),
            _dec_avg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3: shipping priority — dim⋈fact⋈fact join + agg + top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------
@register(
    "q3_top_unshipped",
    f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST({_REVENUE} AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (small, broadcast) ⋈ orders ⋈ lineitem; top-10 via
    TakeOrderedAndProject — no global sort even at 100 TB."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dec_sum(_revenue(), "revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5: local supplier volume — 6-way join through two dimension chains
# ---------------------------------------------------------------------------
@register(
    "q5_region_revenue",
    f"""
    SELECT n_name,
           CAST(ROUND(SUM(CAST({_REVENUE} AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All dimensions (region/nation/customer/supplier) broadcast; the only
    shuffle is lineitem⋈orders on orderkey. The s_nationkey = c_nationkey
    residual rides on the supplier broadcast join."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (supp["s_nationkey"] == cust["c_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(_dec_sum(_revenue(), "revenue"))
    )


# ---------------------------------------------------------------------------
# Revenue per nation per year — join + multi-key agg with a derived key
# ---------------------------------------------------------------------------
@register_extra(
    "q_nation_revenue_year",
    f"""
    SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(CAST({_REVENUE} AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_nation_revenue_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(_dec_sum(_revenue(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# Window: top-3 orders per customer by total price
# ---------------------------------------------------------------------------
@register(
    "q_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank per key — one shuffle on o_custkey; at scale the same
    plan holds (no driver involvement, skew handled by AQE)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# Anti join: customers with no large finished order
# ---------------------------------------------------------------------------
@register(
    "q_customers_no_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderstatus = 'F' AND o_totalprice > 150000)
    """,
)
def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big_f = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)
    )
    return cust.join(
        big_f, cust["c_custkey"] == big_f["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# Semi join: customers with at least one urgent order
# ---------------------------------------------------------------------------
@register_extra(
    "q_urgent_customers",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / UNION / EXCEPT over part attributes
# ---------------------------------------------------------------------------
@register(
    "q_brand_setops",
    """
    SELECT p_brand FROM (
      SELECT p_brand FROM (
        (SELECT DISTINCT p_brand FROM part WHERE p_type = 'ECONOMY')
        INTERSECT
        (SELECT DISTINCT p_brand FROM part WHERE p_size > 25))
      UNION
      SELECT p_brand FROM (
        (SELECT DISTINCT p_brand FROM part WHERE p_type = 'PROMO' AND p_size < 5)
        EXCEPT
        (SELECT DISTINCT p_brand FROM part WHERE p_retailprice > 1500)))
    """,
)
def q_brand_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    economy = part.filter(F.col("p_type") == "ECONOMY").select("p_brand").distinct()
    large = part.filter(F.col("p_size") > 25).select("p_brand").distinct()
    small_promo = (
        part.filter((F.col("p_type") == "PROMO") & (F.col("p_size") < 5))
        .select("p_brand")
        .distinct()
    )
    pricey = part.filter(F.col("p_retailprice") > 1500).select("p_brand").distinct()
    return economy.intersect(large).union(small_promo.exceptAll(pricey)).distinct()


# ---------------------------------------------------------------------------
# Rollup: hierarchical subtotals (grouping-sets surface)
# ---------------------------------------------------------------------------
@register_extra(
    "q_rollup_returns",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), "sum_qty"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Distinct aggregates + stats per market segment
# ---------------------------------------------------------------------------
@register(
    "q_segment_stats",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_bal,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        _dec_sum(F.col("c_acctbal"), "sum_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


# ---------------------------------------------------------------------------
# Full outer join: per-nation wealthy customers vs wealthy suppliers —
# selective filters leave each side missing nations, so both null sides
# of the outer join are actually exercised
# ---------------------------------------------------------------------------
@register(
    "q_nation_wealth_outer",
    """
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
    s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
          FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def q_nation_wealth_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.alias("c")
        .join(supp.alias("s"), F.col("c.nk") == F.col("s.nk"), "full_outer")
        .select(
            F.coalesce(F.col("c.nk"), F.col("s.nk")).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series resample with gap filling: the dense (bucket × series) grid
# left-joins the sparse aggregates, zero-filling empty buckets — the shape
# every monitoring/training-curve pipeline needs and plain GROUP BY omits
# ---------------------------------------------------------------------------
@register(
    "q_events_gapfill",
    """
    WITH bounds AS (
        SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, MIN(ts))) AS BIGINT) AS lo,
               CAST(epoch(time_bucket(INTERVAL 1 HOUR, MAX(ts))) AS BIGINT) AS hi
        FROM events
    ),
    grid AS (
        SELECT unnest(generate_series(lo, hi, 3600)) AS bucket FROM bounds
    ),
    series AS (SELECT DISTINCT event_type FROM events),
    agg AS (
        SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS bucket,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT g.bucket, s.event_type, COALESCE(a.n, 0) AS n
    FROM grid g CROSS JOIN series s
    LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = s.event_type
    """,
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid per event type with zero-filled gaps.

    The grid is sequence+explode over a 1-row bounds aggregate (no driver
    action, no Python); the sparse hourly counts broadcast-join onto it.
    At scale the grid side is tiny (hours × series) while the agg side is
    the big one — so the join broadcasts the GRID, not the data.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = hour_bucket_s("ts")
    bounds = ev.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(3600))).alias("bucket")
    )
    series = ev.select("event_type").distinct()
    agg = (
        ev.groupBy(hour.alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.crossJoin(series)
        .join(agg, ["bucket", "event_type"], "left")
        .select("bucket", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Correlated subqueries through the SQL front-end — both front-ends share
# Catalyst, and these two shapes exercise its decorrelation rewrites
# (correlated scalar subquery → aggregate+join; IN-subquery → left-semi)
# ---------------------------------------------------------------------------
_Q_TOP_SUPPLIER = """
    SELECT s.s_nationkey, s.s_suppkey, s.s_name, ROUND(s.s_acctbal, 2) AS bal
    FROM supplier s
    WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
"""


@register("q_top_supplier_per_nation", _Q_TOP_SUPPLIER)
def q_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: each nation's best-balance supplier(s).
    Catalyst decorrelates this to aggregate-then-join — same plan the
    window-rank formulation produces, written the way a SQL user would."""
    from readwise_vector_db_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q_TOP_SUPPLIER)


_Q_BIG_SPENDERS = """
    SELECT c.c_custkey, o.o_orderkey,
           CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(28,10)), 2) AS DOUBLE) AS price
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IN (
        SELECT o2.o_custkey FROM orders o2
        GROUP BY o2.o_custkey
        HAVING SUM(CAST(o2.o_totalprice AS DECIMAL(28,10))) > 1500000
    )
"""


@register("q_big_spender_orders", _Q_BIG_SPENDERS)
def q_big_spender_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery with HAVING (TPC-H Q18 shape): Catalyst rewrites the
    IN to a left-semi join against the aggregated subquery."""
    from readwise_vector_db_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q_BIG_SPENDERS)


# ---------------------------------------------------------------------------
# Pivot (wide conditional aggregation) — Spark's groupBy().pivot() with a
# FIXED value list (never let pivot infer values at scale: that's an extra
# distinct-collect job over the whole input before planning)
# ---------------------------------------------------------------------------
@register(
    "q_user_event_pivot",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
    FROM events
    WHERE user_id % 5 = 0
    GROUP BY user_id
    """,
)
def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts as columns.  With an explicit value list
    the pivot compiles to one hash aggregate of conditional counts — the
    same plan the hand-written CASE oracle describes."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase"])
        .select(
            "user_id",
            F.col("click").cast("long").alias("click"),
            F.col("view").cast("long").alias("view"),
            F.col("purchase").cast("long").alias("purchase"),
        )
    )


# ---------------------------------------------------------------------------
# Array aggregation: per-group sorted distinct list (deterministic ordering
# makes an array column hash-comparable)
# ---------------------------------------------------------------------------
@register_extra(
    "q_customer_priority_sets",
    """
    SELECT o_custkey,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
               AS priorities,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey % 20 = 0
    GROUP BY o_custkey
    """,
)
def q_customer_priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct order priorities per customer as a SORTED list — the
    sort is what makes the result deterministic under parallel
    aggregation (collect_set order is partition-dependent); emitted as a
    joined string because the driver canon cannot hash list cells."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Window frames: running total + moving average (rowsBetween frames —
# complements the rank-based window in q_top_orders_per_customer)
# ---------------------------------------------------------------------------
@register(
    "q_customer_running_spend",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS run_spend,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3
    FROM orders
    WHERE o_custkey % 100 = 0
    """,
)
def q_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend + 3-order moving average.  One shuffle
    on the partition key; frames evaluate incrementally within partitions."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    order_w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    dec = F.col("o_totalprice").cast("decimal(28,10)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(dec).over(order_w.rowsBetween(W.unboundedPreceding, W.currentRow)),
            2,
        ).cast("double").alias("run_spend"),
        # avg as exact-decimal SUM ÷ COUNT in double, rounded at 6dp: a
        # 3-row avg of cent-scale values adds at most one decimal digit, so
        # 6dp can never land on a rounding boundary — engines' ROUND
        # disagree exactly there (Java rounds the shortest string repr,
        # DuckDB the binary value; found at sf0.1 on a sum/2 = .725)
        F.round(
            F.sum(dec).over(order_w.rowsBetween(-2, W.currentRow)).cast("double")
            / F.count(F.lit(1)).over(order_w.rowsBetween(-2, W.currentRow)),
            6,
        ).alias("avg3"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (ordered-set aggregate; the approx_percentile sketch is
# the scale path — same plan shape, mergeable state)
# ---------------------------------------------------------------------------
@register(
    "q_value_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
           ROUND(quantile_cont(CAST(value AS DOUBLE), 0.95), 6) AS p95,
           ROUND(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS p99,
           COUNT(value) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous-interpolation percentiles per event type.

    Scale note: ``percentile`` buffers each group's values (exact but
    memory-proportional) — the cross-engine-checkable choice.  At 100 TB
    swap in ``approx_percentile(value, [...], accuracy)`` (bounded-memory
    KLL-style sketch, partial-aggregatable) — same plan shape, no exact
    DuckDB twin, which is why the registered entry stays exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count("value").alias("n"),
    )


# ---------------------------------------------------------------------------
# As-of join (temporal): custom operator (operators/asof.py) — DuckDB's
# native ASOF JOIN is the oracle, so the union+window decomposition is
# value-checked end-to-end
# ---------------------------------------------------------------------------
@register(
    "q_events_asof",
    """
    WITH cp AS (
        SELECT user_id, ts, MAX(event_id) AS cp_id
        FROM events WHERE event_id % 50 = 0
        GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id,
           CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
           cp.cp_id
    FROM events e ASOF LEFT JOIN cp
      ON e.user_id = cp.user_id AND e.ts >= cp.ts
    """,
)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event + the id of the latest checkpoint (≤ ts) for its user."""
    from readwise_vector_db_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    cp = (
        ev.filter(F.col("event_id") % 50 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("cp_id"))
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"), cp, key="user_id", payload=["cp_id"]
    )
    return joined.select(
        "event_id", "user_id", epoch_us("ts").alias("ts_us"), "cp_id"
    )


# ---------------------------------------------------------------------------
# JSON column decode (C8: the reference's JSONEncodedDict TypeDecorator,
# models/helpers.py:19-43 → from_json; schema-on-read, stays in codegen)
# ---------------------------------------------------------------------------
@register(
    "q_events_props_json",
    """
    SELECT k % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
    FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, value FROM events)
    GROUP BY 1
    """,
)
def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the JSON props column with a declared schema and aggregate on
    an extracted field — no schema inference pass, no Python in the loop."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.from_json("props", "k LONG").getField("k").alias("k"), "value"
        )
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("value"), "sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets: CUBE with grouping() disambiguation flags (SURVEY §2.7 —
# absent from the reference, free in Spark; flags distinguish "NULL because
# subtotal row" from a genuinely NULL key)
# ---------------------------------------------------------------------------
@register(
    "q_part_cube",
    """
    SELECT p_brand, p_size,
           CAST(GROUPING(p_brand) AS INT) AS g_brand,
           CAST(GROUPING(p_size) AS INT) AS g_size,
           COUNT(*) AS n_parts,
           COUNT(DISTINCT p_type) AS n_types,
           CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_price
    FROM part
    GROUP BY CUBE (p_brand, p_size)
    """,
)
def q_part_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE = all 4 grouping sets in one pass — Spark expands to a single
    hash aggregate over the replicated grouping-id input, one shuffle."""
    part = load_table(spark, sf_dir, "part")
    return part.cube("p_brand", "p_size").agg(
        F.grouping("p_brand").cast("int").alias("g_brand"),
        F.grouping("p_size").cast("int").alias("g_size"),
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_type").alias("n_types"),
        _dec_sum(F.col("p_retailprice"), "sum_price"),
    ).select(
        "p_brand", "p_size", "g_brand", "g_size", "n_parts", "n_types", "sum_price"
    )


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregation (batch twin of the streaming op)
# ---------------------------------------------------------------------------
@register(
    "q_events_hourly",
    """
    SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window == the streaming tumbling window; emitted as epoch seconds
    so the hash is timezone-proof. streaming/windows.py runs the same
    aggregation as a readStream with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("value"), "sum_value"),
        )
        .select(
            epoch_s(F.col("window.start")).alias("bucket"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Events: sliding-window aggregation (batch twin of streaming sliding_rates)
# ---------------------------------------------------------------------------
@register_extra(
    "q_events_sliding",
    """
    SELECT bucket, event_type, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE)
               AS sum_value
    FROM (
        SELECT (epoch_us(ts) // 1000000)
               - ((epoch_us(ts) // 1000000) % 1800) - off AS bucket,
               event_type, value
        FROM events CROSS JOIN (SELECT unnest([0, 1800]) AS off)
    )
    GROUP BY bucket, event_type
    """,
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min (each event lands in exactly 2
    overlapping windows) — the batch twin of streaming/windows.py:
    sliding_rates, emitted as epoch-second window starts.

    Spark's ``window(ts, 1h, 30m)`` replicates each row into its
    ``size/slide`` covering windows before the aggregation — the same
    2× expansion the oracle spells out with its 2-offset cross join.
    The expansion happens map-side, so partial aggregation still
    collapses each partition to ≤ (windows × types) rows pre-shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("value"), "sum_value"),
        )
        .select(
            epoch_s(F.col("window.start")).alias("bucket"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Events: sessionization (gap > 30 min) via lag + running sum
# ---------------------------------------------------------------------------
_SESSION_GAP_US = 30 * 60 * 1_000_000

@register(
    "q_events_sessions",
    f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ), flagged AS (
        SELECT user_id, event_id, ts_us,
               CASE WHEN prev_us IS NULL OR ts_us - prev_us > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ), sessions AS (
        SELECT user_id, ts_us,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic lag+cumsum sessionizer — one shuffle on user_id shared
    by both window functions and the final aggregation (Catalyst reuses
    the partitioning, so this is a single-exchange plan)."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_us", epoch_us("ts"))
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w_order).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w_order) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    # same sort key as w_order (ts ↔ ts_us is a monotone bijection, so
    # ordering by either is the same permutation): both window functions
    # then share one sort and one Window operator instead of paying a
    # second per-partition sort for a differently-keyed-but-equal order
    w_run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(w_run).cast("long"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


# ---------------------------------------------------------------------------
# Binned range join (point-in-interval without a cross product): Spark has
# no range-join strategy — inequality joins fall back to nested-loop.
# operators/rangejoin.py quantizes the domain into bins, explodes each
# interval to its covered bins, and equi-joins on the bin, so Catalyst
# plans a hash join; containment is re-verified exactly on matches.
# ---------------------------------------------------------------------------
_RJ_HALF_US = 300_000_000  # ±300 s window around each anchor event
_RJ_BIN_US = 600_000_000  # bin ≈ interval width → ≤2 bins per interval


@register(
    "q_events_range_join",
    f"""
    WITH ev AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
                FROM events),
    a AS (SELECT event_id AS anchor_id,
                 ts_us - {_RJ_HALF_US} AS lo, ts_us + {_RJ_HALF_US} AS hi
          FROM ev WHERE value > 300),
    hits AS (SELECT a.anchor_id, e.value
             FROM a JOIN ev e ON e.ts_us >= a.lo AND e.ts_us <= a.hi)
    SELECT anchor_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE)
               AS sum_value
    FROM hits GROUP BY anchor_id
    """,
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity surrounding every high-value event: all events within
    ±300 s of each value>300 anchor, counted and summed per anchor via
    the binned range join (equi-join on 600 s bins + exact re-verify)."""
    from readwise_vector_db_spark.operators.rangejoin import binned_range_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", epoch_us("ts").alias("ts_us"), "value"
    )
    anchors = ev.filter(F.col("value") > 300).select(
        F.col("event_id").alias("anchor_id"),
        (F.col("ts_us") - _RJ_HALF_US).alias("lo"),
        (F.col("ts_us") + _RJ_HALF_US).alias("hi"),
    )
    pairs = binned_range_join(
        ev, anchors, point_col="ts_us", lo_col="lo", hi_col="hi",
        bin_width=_RJ_BIN_US,
    )
    return pairs.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,10)")), 2
        ).cast("double").alias("sum_value"),
    )
