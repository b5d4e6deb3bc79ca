"""Sixth tranche: more TPC-DS-shaped query coverage.

Extends relational4.py's TPC-DS tranche (reference: README.md:52-61,
src/benchmark/tpcds_benchmark.cpp, resources/benchmark/tpcds) with five
shapes it didn't yet exercise: multi-band conditional-count pivots (q88),
order-size frequent-buyer HAVING chains (q34/q73), year-over-year growth
self-joins on aggregates (q11/q74), correlated per-group above-average
filters decorrelated into an aggregate join rather than a window (q1/q30
— the window variant is qds_above_avg_suppliers), channel-partitioned
return-ratio ranking over a UNION ALL (q49), and full CUBE with
GROUPING() disambiguation (q27's rollup cousin). Each is re-based onto
the reduced driver schema, expressed via the DataFrame API so Catalyst
picks the physical plan, and hash-exact gated vs a DuckDB oracle by the
full-registry pytest parametrization (driver slots stay capped at 50).

Float determinism follows the decimal-cast convention (relational.py);
ratio comparisons are restated multiplicatively (x*cnt > tot*k) or over
IEEE-exact double quotients of exact integers so no engine-specific
summation order can flip a boundary row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .relational import _dsum, _register


@_register(
    "qds_quantity_band_counts",
    """
    SELECT
      COUNT(CASE WHEN l_quantity <= 10 AND l_returnflag = 'R' THEN 1 END) AS b1_ret,
      COUNT(CASE WHEN l_quantity <= 10 AND l_returnflag <> 'R' THEN 1 END) AS b1_kept,
      COUNT(CASE WHEN l_quantity > 10 AND l_quantity <= 25 AND l_returnflag = 'R' THEN 1 END) AS b2_ret,
      COUNT(CASE WHEN l_quantity > 10 AND l_quantity <= 25 AND l_returnflag <> 'R' THEN 1 END) AS b2_kept,
      COUNT(CASE WHEN l_quantity > 25 AND l_quantity <= 40 AND l_returnflag = 'R' THEN 1 END) AS b3_ret,
      COUNT(CASE WHEN l_quantity > 25 AND l_quantity <= 40 AND l_returnflag <> 'R' THEN 1 END) AS b3_kept,
      COUNT(CASE WHEN l_quantity > 40 AND l_returnflag = 'R' THEN 1 END) AS b4_ret,
      COUNT(CASE WHEN l_quantity > 40 AND l_returnflag <> 'R' THEN 1 END) AS b4_kept
    FROM lineitem
    WHERE l_discount >= 0.02
    """,
)
def qds_quantity_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape: one pass over the fact table producing a single
    row of band counts. q88 writes eight self-joined subqueries; the
    Spark-first plan is one scan with eight conditional counts — a
    map-side-combinable aggregate with no join at all, which is the plan
    you want at 100 TB (q88's literal shape would scan the fact table
    eight times)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.02)

    def band(lo, hi):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("l_quantity") > lo)
        if hi is not None:
            cond = cond & (F.col("l_quantity") <= hi)
        return cond

    aggs = []
    for i, (lo, hi) in enumerate([(None, 10), (10, 25), (25, 40), (40, None)], 1):
        aggs.append(
            F.count(F.when(band(lo, hi) & (F.col("l_returnflag") == "R"), 1)).alias(
                f"b{i}_ret"
            )
        )
        aggs.append(
            F.count(F.when(band(lo, hi) & (F.col("l_returnflag") != "R"), 1)).alias(
                f"b{i}_kept"
            )
        )
    return li.agg(*aggs)


@_register(
    "qds_frequent_buyers",
    """
    WITH order_sizes AS (
      SELECT o.o_custkey, l.l_orderkey, COUNT(*) AS items
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey, l.l_orderkey
    ),
    busy AS (
      SELECT o_custkey, COUNT(*) AS n_big_orders
      FROM order_sizes WHERE items BETWEEN 5 AND 7
      GROUP BY o_custkey HAVING COUNT(*) >= 2
    )
    SELECT c.c_custkey, c.c_name, b.n_big_orders
    FROM busy b JOIN customer c ON b.o_custkey = c.c_custkey
    """,
)
def qds_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73 shape: per-order basket sizes, a HAVING filter over
    the per-customer count of mid-size baskets, then a join back to the
    customer dimension. Two stacked aggregations; the second groupBy's
    input is already partitioned by a superset key (o_custkey,
    l_orderkey), so AQE coalesces the second exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    order_sizes = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_orderkey")
        .agg(F.count(F.lit(1)).alias("items"))
    )
    busy = (
        order_sizes.filter(F.col("items").between(5, 7))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
        .filter(F.col("n_big_orders") >= 2)
    )
    return busy.join(customer, busy.o_custkey == customer.c_custkey).select(
        "c_custkey", "c_name", "n_big_orders"
    )


@_register(
    "qds_yoy_growth",
    """
    WITH yearly AS (
      SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM orders GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
    )
    SELECT prev.o_custkey, prev.yr AS prev_yr,
           prev.total AS prev_total, cur.total AS cur_total
    FROM yearly prev JOIN yearly cur
      ON prev.o_custkey = cur.o_custkey AND cur.yr = prev.yr + 1
    WHERE cur.total > prev.total * CAST(2 AS DOUBLE)
    """,
)
def qds_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q11/q74 shape: a yearly per-customer aggregate self-joined
    on (customer, consecutive years) with a growth-ratio filter, restated
    multiplicatively (cur > prev*2) over decimal-exact totals so both
    engines compare identical doubles. The self-join keys share the
    aggregate's partitioning, so Catalyst reuses the exchange."""
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        "o_custkey", F.year("o_orderdate").cast("bigint").alias("yr")
    ).agg(_dsum(F.col("o_totalprice"), "total"))
    prev = yearly.alias("prev")
    cur = yearly.alias("cur")
    return (
        prev.join(
            cur,
            (F.col("prev.o_custkey") == F.col("cur.o_custkey"))
            & (F.col("cur.yr") == F.col("prev.yr") + 1),
        )
        .filter(F.col("cur.total") > F.col("prev.total") * F.lit(2).cast("double"))
        .select(
            F.col("prev.o_custkey").alias("o_custkey"),
            F.col("prev.yr").alias("prev_yr"),
            F.col("prev.total").alias("prev_total"),
            F.col("cur.total").alias("cur_total"),
        )
    )


@_register(
    "qds_returns_above_nation_avg",
    """
    WITH cust_ret AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS ret,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS ret_exact
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_nationkey
    )
    SELECT r.c_custkey, r.c_nationkey, r.ret
    FROM cust_ret r
    WHERE r.ret_exact * (SELECT COUNT(*) FROM cust_ret r2
                         WHERE r2.c_nationkey = r.c_nationkey)
          > (SELECT CAST(SUM(r2.ret_exact) AS DECIMAL(38,6)) FROM cust_ret r2
             WHERE r2.c_nationkey = r.c_nationkey) * 12 / 10
    """,
)
def qds_returns_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1/q30 shape: customers whose returned revenue exceeds 1.2x
    the average over their nation — a correlated scalar aggregate
    subquery. The oracle keeps the correlated form (DuckDB decorrelates
    it itself); the Spark plan IS the decorrelation: one extra groupBy on
    the nation key broadcast-joined back, with the avg compare restated
    exactly in decimals (ret*cnt > tot*12/10) so no double summation
    order is involved. Contrast with qds_above_avg_suppliers, which does
    the same semantics via an analytic window."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    net = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    cust_ret = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(net).cast("decimal(38,6)").alias("ret_exact"))
    )
    nation_stats = cust_ret.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.sum("ret_exact").cast("decimal(38,6)").alias("tot"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        cust_ret.join(
            F.broadcast(nation_stats), cust_ret.c_nationkey == nation_stats.nk
        )
        .filter(
            F.col("ret_exact") * F.col("cnt") > F.col("tot") * F.lit(12) / F.lit(10)
        )
        .select(
            "c_custkey", "c_nationkey", F.col("ret_exact").cast("double").alias("ret")
        )
    )


@_register(
    "qds_channel_return_rank",
    """
    WITH base AS (
      SELECT 'open' AS channel, l_partkey,
             COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_ret,
             COUNT(*) AS n_tot
      FROM lineitem WHERE l_linestatus = 'O' GROUP BY l_partkey
      UNION ALL
      SELECT 'finished' AS channel, l_partkey,
             COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_ret,
             COUNT(*) AS n_tot
      FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_partkey
    )
    SELECT channel, l_partkey, n_ret, n_tot, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT channel, l_partkey, n_ret, n_tot,
             RANK() OVER (PARTITION BY channel
                          ORDER BY CAST(n_ret AS DOUBLE) / n_tot DESC, l_partkey) AS rnk
      FROM base WHERE n_tot >= 3
    ) WHERE rnk <= 10
    """,
)
def qds_channel_return_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape: per-channel return ratios ranked within each
    channel, channels built by a UNION ALL of filtered scans. The rank
    key is an IEEE-exact double quotient of two small exact integers
    (identical bits in both engines) with the part key as tiebreak; the
    window runs over the already-aggregated per-part rows, not the fact
    table."""
    li = load_table(spark, sf_dir, "lineitem")

    def channel(status: str, name: str) -> DataFrame:
        return (
            li.filter(F.col("l_linestatus") == status)
            .groupBy("l_partkey")
            .agg(
                F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_ret"),
                F.count(F.lit(1)).alias("n_tot"),
            )
            .select(F.lit(name).alias("channel"), "l_partkey", "n_ret", "n_tot")
        )

    base = channel("O", "open").unionByName(channel("F", "finished")).filter(
        F.col("n_tot") >= 3
    )
    w = Window.partitionBy("channel").orderBy(
        (F.col("n_ret").cast("double") / F.col("n_tot")).desc(), F.asc("l_partkey")
    )
    return (
        base.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .select("channel", "l_partkey", "n_ret", "n_tot", "rnk")
    )


@_register(
    "qds_status_priority_cube",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def qds_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q27-family shape taken to full CUBE: all four grouping
    levels over (status, priority) in one pass with a GROUPING() id
    separating them; rollup coverage lives in qds_channel_rollup. CUBE is
    one shuffle — Spark expands the grouping sets map-side."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), "revenue"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("bigint")
            .alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
    )
