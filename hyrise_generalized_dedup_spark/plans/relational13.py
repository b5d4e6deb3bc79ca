"""Thirteenth tranche: ninth TPC-DS-shaped batch of query patterns.

Extends relational4/6/7/8/9/10/11/12 (reference: README.md:52-61,
src/benchmark/tpcds_benchmark.cpp) with six patterns still uncovered:
user lifecycle states (activity-span classification census), ordered
priority-transition pairs (lag over a per-customer sequence — the Markov
census shape), a months-since-last-order recency histogram anchored on
a global scalar subquery, the modal order-count (argmax over a
distribution, tie-broken), per-nation supplier share with a top-k
window, and ratio-to-parent within a hierarchy level. Same conventions:
DataFrame API so Catalyst plans it, hash-exact vs DuckDB via the
full-registry pytest parametrization, DECIMAL-exact sums, ties broken
by a unique key before any ranking, one IEEE division per ratio.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .relational import _register


@_register(
    "evt_user_lifecycle",
    """
    WITH per_user AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             COUNT(DISTINCT EXTRACT(DAY FROM ts)) AS n_days,
             MIN(EXTRACT(DAY FROM ts)) AS first_day,
             MAX(EXTRACT(DAY FROM ts)) AS last_day
      FROM events GROUP BY user_id
    ), labeled AS (
      SELECT *,
             CASE WHEN n_days >= 28 THEN 'daily'
                  WHEN n_days >= 26 THEN 'regular'
                  ELSE 'light' END AS state
      FROM per_user
    )
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(n_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_active_days,
           CAST(MIN(first_day) AS BIGINT) AS earliest_day
    FROM labeled GROUP BY state
    """,
)
def evt_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle-state census: per-user engagement classified by count
    of distinct active days (the one-month fixture makes day-of-month a
    valid clock; thresholds probed non-vacuous at both SFs), then one
    census per state. Two aggregations, no window, no joins — the
    per-user frame is the only shuffle."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(F.dayofmonth("ts")).alias("n_days"),
        F.min(F.dayofmonth("ts")).alias("first_day"),
        F.max(F.dayofmonth("ts")).alias("last_day"),
    )
    state = (
        F.when(F.col("n_days") >= 28, "daily")
        .when(F.col("n_days") >= 26, "regular")
        .otherwise("light")
    )
    return per_user.groupBy(state.alias("state")).agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        (
            F.sum("n_days").cast("double") / F.count("*").cast("double")
        ).alias("avg_active_days"),
        F.min("first_day").cast("long").alias("earliest_day"),
    )


@_register(
    "qds_priority_transition",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderpriority,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
               AS prev_priority
      FROM orders
    )
    SELECT prev_priority, o_orderpriority AS next_priority,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_priority IS NOT NULL
    GROUP BY prev_priority, o_orderpriority
    """,
)
def qds_priority_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition census over each customer's ordered order
    sequence: lag the priority along (orderdate, orderkey), count
    (prev, next) pairs. One per-customer window + one census groupBy;
    the window partitions on the customer key, so no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderpriority",
        F.lag("o_orderpriority").over(w).alias("prev_priority"),
    )
    return (
        seq.filter(F.col("prev_priority").isNotNull())
        .groupBy("prev_priority", F.col("o_orderpriority").alias("next_priority"))
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )


@_register(
    "qds_recency_histogram",
    """
    WITH anchor AS (
      SELECT MAX(EXTRACT(YEAR FROM o_orderdate) * 12
                 + EXTRACT(MONTH FROM o_orderdate)) AS max_ym
      FROM orders
    ), per_cust AS (
      SELECT o_custkey,
             MAX(EXTRACT(YEAR FROM o_orderdate) * 12
                 + EXTRACT(MONTH FROM o_orderdate)) AS last_ym
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(floor(CAST(a.max_ym - p.last_ym AS DOUBLE)
                      / CAST(6 AS DOUBLE)) AS BIGINT) AS half_years_ago,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust p CROSS JOIN anchor a
    GROUP BY 1
    """,
)
def qds_recency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency histogram: months since each customer's last order,
    anchored on the corpus-wide max month (a 1-row broadcast cross
    join), bucketed per half-year with floor() pinned on both engines.
    Integer month keys (year*12+month) keep the arithmetic exact."""
    o = load_table(spark, sf_dir, "orders")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    anchor = o.agg(F.max(ym).alias("max_ym"))
    per_cust = o.groupBy("o_custkey").agg(F.max(ym).alias("last_ym"))
    bucket = F.floor(
        (F.col("max_ym") - F.col("last_ym")).cast("double")
        / F.lit(6).cast("double")
    ).cast("long")
    return (
        per_cust.crossJoin(F.broadcast(anchor))
        .groupBy(bucket.alias("half_years_ago"))
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


@_register(
    "qds_modal_order_count",
    """
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ), dist AS (
      SELECT n_orders, COUNT(*) AS n_customers
      FROM per_cust GROUP BY n_orders
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY n_customers DESC,
                                             n_orders) = 1
                THEN 1 ELSE 0 END AS INTEGER) AS is_modal
    FROM dist
    """,
)
def qds_modal_order_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-per-customer distribution with the mode flagged: two
    aggregations collapse the corpus to a distribution-sized frame, then
    one row_number window (count desc, value tiebreak) marks the argmax
    — no mode() builtin, whose tie policy differs across engines."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    dist = per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))
    w = Window.orderBy(F.col("n_customers").desc(), F.col("n_orders"))
    return dist.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_customers").cast("long").alias("n_customers"),
        (F.row_number().over(w) == 1).cast("int").alias("is_modal"),
    )


@_register(
    "qds_nation_share_topk",
    """
    WITH tot AS (
      SELECT s_nationkey,
             SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS nation_bal
      FROM supplier GROUP BY s_nationkey
    ), ranked AS (
      SELECT s.s_nationkey, s.s_suppkey, s.s_acctbal,
             t.nation_bal,
             ROW_NUMBER() OVER (PARTITION BY s.s_nationkey
                                ORDER BY s.s_acctbal DESC, s.s_suppkey)
               AS rk
      FROM supplier s JOIN tot t ON s.s_nationkey = t.s_nationkey
    )
    SELECT s_nationkey, s_suppkey,
           CAST(s_acctbal AS DOUBLE) AS acctbal,
           CAST(s_acctbal AS DOUBLE) / CAST(nation_bal AS DOUBLE)
             AS share_of_nation,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 2
    """,
)
def qds_nation_share_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 suppliers per nation with their share of the nation's total
    balance: DECIMAL-exact per-nation totals broadcast back, one
    partitioned row_number window (suppkey tiebreak), one IEEE division
    per emitted row."""
    s = load_table(spark, sf_dir, "supplier")
    tot = s.groupBy("s_nationkey").agg(
        F.sum(F.col("s_acctbal").cast("decimal(38,6)")).alias("nation_bal")
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), "s_suppkey"
    )
    ranked = s.join(F.broadcast(tot), "s_nationkey").select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        "nation_bal",
        F.row_number().over(w).alias("rk"),
    )
    return ranked.filter(F.col("rk") <= 2).select(
        "s_nationkey",
        "s_suppkey",
        F.col("s_acctbal").cast("double").alias("acctbal"),
        (
            F.col("s_acctbal").cast("double") / F.col("nation_bal").cast("double")
        ).alias("share_of_nation"),
        F.col("rk").cast("long").alias("rk"),
    )


@_register(
    "qds_ratio_to_parent",
    """
    WITH cells AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY o_orderstatus) AS DOUBLE)
             AS share_of_status
    FROM cells
    """,
)
def qds_ratio_to_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent within a hierarchy level: each (status, priority)
    cell's share of its status subtotal via a partitioned window SUM
    over exact integer counts (one IEEE division at the end). The window
    runs over the cell census, not the fact table."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus")
    return cells.select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
            "share_of_status"
        ),
    )
