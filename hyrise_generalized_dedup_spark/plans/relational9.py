"""Ninth tranche: fifth TPC-DS-shaped batch of query patterns.

Extends relational4/6/7/8 (reference: README.md:52-61,
src/benchmark/tpcds_benchmark.cpp, resources/benchmark/tpcds) with six
patterns the earlier tranches don't exercise: cross-channel
year-over-year spend ratios (q74/q11's two-channel comparison restated
over order-status channels), rolling 3-month moving revenue windows
(q53/q63's rolling-average flavor, DECIMAL-exact), first-order cohort
retention (q1's returning-customer shape by acquisition year),
return-rate-vs-nation-average outliers (q1 proper, multiplicative),
cumulative histogram shares over price buckets (q67's banded rollup),
and activity-gap detection via band anti-joins (q16's exclusion
flavor). Same conventions as the earlier tranches: DataFrame API so
Catalyst plans it, hash-exact vs DuckDB through the full-registry
pytest parametrization, DECIMAL-exact sums (window sums stay DECIMAL —
DuckDB's segment-tree double accumulation is not bit-stable), every
ratio either multiplicative over exact values or one IEEE division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .relational import _dsum, _register


@_register(
    "qds_cross_channel_ratio",
    """
    WITH per AS (
      SELECT o_custkey,
             SUM(CASE WHEN o_orderstatus = 'O'
                      THEN CAST(o_totalprice AS DECIMAL(38,6))
                      ELSE CAST(0 AS DECIMAL(38,6)) END) AS open_spend,
             SUM(CASE WHEN o_orderstatus = 'F'
                      THEN CAST(o_totalprice AS DECIMAL(38,6))
                      ELSE CAST(0 AS DECIMAL(38,6)) END) AS fin_spend
      FROM orders GROUP BY o_custkey
    ), tot AS (
      SELECT SUM(open_spend) AS t_open, SUM(fin_spend) AS t_fin FROM per
    )
    SELECT p.o_custkey,
           CAST(p.open_spend AS DOUBLE) AS open_spend,
           CAST(p.fin_spend AS DOUBLE) AS fin_spend
    FROM per p, tot t
    WHERE p.fin_spend > 0 AND t.t_fin > 0
      AND p.open_spend * t.t_fin > p.fin_spend * t.t_open * 2
    """,
)
def qds_cross_channel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74/q11 shape: customers whose open-vs-finished spend
    ratio is more than 2x the corpus-wide ratio. The cross-channel
    comparison is multiplicative over DECIMAL-exact sums (no division
    until the projection), and the corpus totals are a 1-row broadcast
    — the scalar 'subquery' costs one partial-agg job at any scale."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(38,6)")
    zero = F.lit(0).cast("decimal(38,6)")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", dec).otherwise(zero)).alias(
            "open_spend"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "F", dec).otherwise(zero)).alias(
            "fin_spend"
        ),
    )
    tot = per.agg(
        F.sum("open_spend").alias("t_open"), F.sum("fin_spend").alias("t_fin")
    )
    return (
        per.join(F.broadcast(tot))
        .filter(
            (F.col("fin_spend") > 0)
            & (F.col("t_fin") > 0)
            & (
                F.col("open_spend") * F.col("t_fin")
                > F.col("fin_spend") * F.col("t_open") * 2
            )
        )
        .select(
            "o_custkey",
            F.col("open_spend").cast("double").alias("open_spend"),
            F.col("fin_spend").cast("double").alias("fin_spend"),
        )
    )


@_register(
    "qds_rolling_3mo_revenue",
    """
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders
      GROUP BY EXTRACT(year FROM o_orderdate), EXTRACT(month FROM o_orderdate)
    )
    SELECT yr, mo, CAST(rev AS DOUBLE) AS rev,
           CAST(SUM(rev) OVER (ORDER BY yr, mo
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rev_3mo
    FROM monthly
    """,
)
def qds_rolling_3mo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q53/q63 shape: monthly revenue rollup with a 3-month
    moving window sum. The rollup shrinks the fact table to one row per
    month BEFORE the window, so the single-partition ordered window runs
    over report-sized data at any corpus scale; the window sum stays
    DECIMAL until the final cast (cross-engine bit stability)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
    w = Window.orderBy("yr", "mo").rowsBetween(-2, 0)
    return monthly.select(
        "yr",
        "mo",
        F.col("rev").cast("double").alias("rev"),
        F.sum("rev").over(w).cast("double").alias("rev_3mo"),
    )


@_register(
    "qds_first_order_cohort",
    """
    WITH firsts AS (
      SELECT o_custkey,
             CAST(MIN(EXTRACT(year FROM o_orderdate)) AS BIGINT) AS cohort,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT cohort,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders
    FROM firsts GROUP BY cohort
    """,
)
def qds_first_order_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1's returning-customer shape by acquisition cohort: group
    customers by the year of their first order, report cohort size,
    how many came back, and total order volume. One partial-agg pass to
    per-customer rows, one to cohorts — both map-side combinable."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).cast("bigint").alias("cohort"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("n_orders") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum("n_orders").cast("bigint").alias("total_orders"),
    )


@_register(
    "qds_return_rate_outliers",
    """
    WITH per AS (
      SELECT o.o_custkey, c.c_nationkey,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ret,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey, c.c_nationkey
    ), nat AS (
      SELECT c_nationkey, SUM(n_ret) AS nat_ret, SUM(n_items) AS nat_items
      FROM per GROUP BY c_nationkey
    )
    SELECT p.o_custkey, CAST(p.c_nationkey AS BIGINT) AS nationkey,
           p.n_ret, p.n_items
    FROM per p JOIN nat n ON n.c_nationkey = p.c_nationkey
    WHERE p.n_items >= 10
      AND p.n_ret * n.nat_items * 10 > n.nat_ret * p.n_items * 12
    """,
)
def qds_return_rate_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1 proper: customers whose item return rate exceeds 1.2x
    their nation's average rate (integer-multiplicative — 10/12 avoids
    any float comparison), with a minimum-volume floor. The nation
    rollup reuses the per-customer aggregate, and the nation table
    (25 rows) broadcasts into the final filter join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .groupBy("o_custkey", "c_nationkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_ret"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    nat = per.groupBy("c_nationkey").agg(
        F.sum("n_ret").alias("nat_ret"), F.sum("n_items").alias("nat_items")
    )
    return (
        per.join(F.broadcast(nat), "c_nationkey")
        .filter(
            (F.col("n_items") >= 10)
            & (
                F.col("n_ret") * F.col("nat_items") * 10
                > F.col("nat_ret") * F.col("n_items") * 12
            )
        )
        .select(
            "o_custkey",
            F.col("c_nationkey").cast("bigint").alias("nationkey"),
            "n_ret",
            "n_items",
        )
    )


@_register(
    "qds_price_bucket_cdf",
    """
    WITH b AS (
      SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY floor(o_totalprice / 50000)
    ), t AS (
      SELECT SUM(n) AS total FROM b
    )
    SELECT b.bucket, b.n,
           CAST(SUM(b.n) OVER (ORDER BY b.bucket) AS BIGINT) AS cum_n,
           CAST(SUM(b.n) OVER (ORDER BY b.bucket) AS DOUBLE)
             / CAST(t.total AS DOUBLE) AS cum_share
    FROM b, t
    """,
)
def qds_price_bucket_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67's banded-rollup flavor: fixed-width price buckets with
    cumulative counts and CDF share. The bucket rollup happens before
    the ordered window (report-sized input); counts are integers so the
    running sum is exact, and the share is one IEEE division of exact
    integers — bit-stable on both engines."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = b.agg(F.sum("n").alias("total"))
    w = Window.orderBy("bucket")
    return (
        b.join(F.broadcast(t))
        .select(
            "bucket",
            "n",
            F.sum("n").over(w).cast("bigint").alias("cum_n"),
            (
                F.sum("n").over(w).cast("double")
                / F.col("total").cast("double")
            ).alias("cum_share"),
        )
    )


@_register(
    "qds_activity_gap",
    """
    SELECT c.c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders a
                  WHERE a.o_custkey = c.c_custkey
                    AND a.o_orderdate < DATE '1997-01-01')
      AND EXISTS (SELECT 1 FROM orders b
                  WHERE b.o_custkey = c.c_custkey
                    AND b.o_orderdate >= DATE '1998-01-01')
      AND NOT EXISTS (SELECT 1 FROM orders g
                      WHERE g.o_custkey = c.c_custkey
                        AND g.o_orderdate >= DATE '1997-01-01'
                        AND g.o_orderdate < DATE '1998-01-01')
    """,
)
def qds_activity_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q16's exclusion flavor as churn detection: customers
    active before 1997 AND after 1998 with NO orders in the 1997 gap
    year — two semi joins and one anti join against date-band slices of
    the same fact table (each slice filter pushes to the scan; the
    three probe sides agg to distinct custkeys before joining)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    before = o.filter(F.col("o_orderdate") < "1997-01-01").select(
        F.col("o_custkey").alias("c_custkey")
    )
    after = o.filter(F.col("o_orderdate") >= "1998-01-01").select(
        F.col("o_custkey").alias("c_custkey")
    )
    gap = o.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(before, "c_custkey", "left_semi")
        .join(after, "c_custkey", "left_semi")
        .join(gap, "c_custkey", "left_anti")
        .select("c_custkey")
    )
