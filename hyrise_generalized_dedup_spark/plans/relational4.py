"""Fourth tranche: TPC-DS-shaped query coverage.

The reference ships multiple benchmark suites beyond TPC-H — TPC-DS among
them (reference: README.md:52-61, src/benchmark/tpcds_benchmark.cpp,
resources/benchmark/tpcds/tpcds-result-reproduction) — whose query shapes
exercise capabilities TPC-H doesn't: multi-channel UNION ALL feeding a
ROLLUP with GROUPING() disambiguation (q5/q77), rank-over-aggregate
windows (q67), date-dim star joins with brand pivots (q3), cross-channel
customer INTERSECTs (q38), and per-entity vs partition-average ratio
filters (q53). Each shape is re-based onto the reduced driver schema with
the operator structure preserved, expressed via the DataFrame API so
Catalyst picks the physical plan, and hash-exact gated against a DuckDB
oracle in the full registry (driver slots stay capped at 50; pytest
parametrizes the full registry).

Float determinism follows the decimal-cast convention (relational.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window
from pyspark.sql import DataFrame

from ..sources.tables import load_table
from .relational import _dsum, _register


@_register(
    "qds_channel_rollup",
    """
    WITH channels AS (
      SELECT 'open' AS channel, EXTRACT(YEAR FROM o_orderdate) AS yr,
             CAST(o_totalprice AS DECIMAL(38,6)) AS price
      FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'finished' AS channel, EXTRACT(YEAR FROM o_orderdate) AS yr,
             CAST(o_totalprice AS DECIMAL(38,6)) AS price
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT COALESCE(channel, 'ALL') AS channel,
           CAST(COALESCE(yr, -1) AS BIGINT) AS yr,
           CAST(GROUPING(channel) + GROUPING(yr) AS BIGINT) AS lvl,
           COUNT(*) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
    FROM channels
    GROUP BY ROLLUP (channel, yr)
    """,
)
def qds_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q5/q77 shape: per-channel sub-plans UNION ALL'd into one
    ROLLUP with GROUPING() tagging the aggregation level. COALESCE folds
    the rollup NULLs into sentinel values so the row identity is stable
    across engines."""
    orders = load_table(spark, sf_dir, "orders")
    channels = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(
            F.lit("open").alias("channel"),
            F.year("o_orderdate").alias("yr"),
            F.col("o_totalprice").cast("decimal(38,6)").alias("price"),
        )
        .unionByName(
            orders.filter(F.col("o_orderstatus") == "F").select(
                F.lit("finished").alias("channel"),
                F.year("o_orderdate").alias("yr"),
                F.col("o_totalprice").cast("decimal(38,6)").alias("price"),
            )
        )
    )
    return channels.rollup("channel", "yr").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("revenue"),
        (F.grouping("channel") + F.grouping("yr")).cast("bigint").alias("lvl"),
    ).select(
        F.coalesce("channel", F.lit("ALL")).alias("channel"),
        F.coalesce("yr", F.lit(-1)).cast("bigint").alias("yr"),
        "lvl",
        "n_orders",
        "revenue",
    )


@_register(
    "qds_brand_year_rank",
    """
    WITH agg AS (
      SELECT p.p_brand, EXTRACT(YEAR FROM l.l_shipdate) AS yr,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sales
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, EXTRACT(YEAR FROM l.l_shipdate)
    )
    SELECT p_brand, CAST(yr AS BIGINT) AS yr, sales, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT p_brand, yr, sales,
             RANK() OVER (PARTITION BY yr ORDER BY sales DESC, p_brand) AS rnk
      FROM agg
    ) WHERE rnk <= 5
    """,
)
def qds_brand_year_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 shape: rank-over-aggregate — aggregate sales per
    (brand, year), then RANK within each year and keep the top 5. The
    window runs over the (already small) aggregate, not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.year("l_shipdate").alias("yr"))
        .agg(_dsum(F.col("l_extendedprice"), "sales"))
    )
    w = Window.partitionBy("yr").orderBy(F.desc("sales"), F.asc("p_brand"))
    return (
        agg.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select("p_brand", F.col("yr").cast("bigint").alias("yr"), "sales", "rnk")
    )


@_register(
    "qds_date_star_brand",
    """
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr, p.p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS net
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 40 AND o.o_orderpriority = '1-URGENT'
    GROUP BY EXTRACT(YEAR FROM o.o_orderdate), p.p_brand
    """,
)
def qds_date_star_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q3 shape: fact table star-joined to a date dimension (the
    orders date column plays date_dim) and an item dimension, dimension
    filters pushed into both scans, grouped by (year, brand)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"), "p_brand"
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "net"),
        )
    )


@_register(
    "qds_cross_channel_customers",
    """
    SELECT COUNT(*) AS n_cross FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
    )
    """,
)
def qds_cross_channel_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38 shape: customers present in EVERY channel — a chain of
    INTERSECTs (Catalyst plans them as left-semi joins) counted once."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    fin_c = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    pos_c = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("k")
    )
    return (
        open_c.intersect(fin_c).intersect(pos_c)
        .agg(F.count(F.lit(1)).alias("n_cross"))
    )


@_register(
    "qds_above_avg_suppliers",
    """
    WITH per_supp AS (
      SELECT l_suppkey, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY l_suppkey, l_linestatus
    )
    SELECT l_suppkey, l_linestatus, qty FROM (
      SELECT l_suppkey, l_linestatus, qty,
             CAST(SUM(CAST(qty AS DECIMAL(38,6))) OVER (PARTITION BY l_linestatus) AS DOUBLE) AS tot,
             COUNT(*) OVER (PARTITION BY l_linestatus) AS cnt
      FROM per_supp
    ) WHERE qty * cnt > tot * 1.2
    """,
)
def qds_above_avg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q44/q53 shape: per-entity aggregate compared to its
    partition's average via an unordered analytic window; the avg compare
    is restated as qty*cnt > tot*1.2 so no engine-specific double
    division order is involved (decimal-exact tot, exact integers cnt)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), "qty")
    )
    w = Window.partitionBy("l_linestatus")
    return (
        per_supp.withColumn(
            "tot", F.sum(F.col("qty").cast("decimal(38,6)")).over(w).cast("double")
        )
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("qty") * F.col("cnt") > F.col("tot") * 1.2)
        .select("l_suppkey", "l_linestatus", "qty")
    )
