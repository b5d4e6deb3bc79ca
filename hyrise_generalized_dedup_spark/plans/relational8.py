"""Eighth tranche: fourth TPC-DS-shaped batch of query patterns.

Extends relational4/6/7 (reference: README.md:52-61,
src/benchmark/tpcds_benchmark.cpp, resources/benchmark/tpcds) with six
patterns the earlier tranches don't exercise: NTILE decile reports
(q98/q49), aggregate-of-aggregate percentile filters restated
multiplicatively (q30), market-basket co-occurrence self-joins (q29),
month-over-month increase streaks via LAG over a monthly rollup (q47's
sequential flavor), multi-year repeat-buyer retention (q1's returning-
customer shape), and share-of-total via a window sum over an aggregate
(q11's fraction filter done with a window instead of a scalar
subquery). Same conventions: reduced driver schema, DataFrame API so
Catalyst plans it, hash-exact vs DuckDB through the full-registry
pytest parametrization, DECIMAL-exact sums (window sums stay DECIMAL —
DuckDB's segment-tree double accumulation is not bit-stable), and every
ratio either multiplicative over exact values or one IEEE division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .relational import _dsum, _register


@_register(
    "qds_decile_report",
    """
    WITH t AS (
      SELECT o_orderkey, o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM t GROUP BY decile
    """,
)
def qds_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98/q49 shape: NTILE deciles over the order-value
    distribution (tie-broken by key for determinism), then per-decile
    stats. The global NTILE is a single-partition sort — fine for report
    output sizes; at fact-table volume the percentile variant would use
    approx buckets instead (documented tradeoff, not needed here)."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(10).over(Window.orderBy("o_totalprice", "o_orderkey")).alias("decile"),
    )
    return t.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        _dsum(F.col("o_totalprice"), "total"),
    )


@_register(
    "qds_above_nation_avg_customers",
    """
    WITH spend AS (
      SELECT c.c_custkey, c.c_nationkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS s
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ), nat AS (
      SELECT c_nationkey, SUM(s) AS nation_total,
             CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM spend GROUP BY c_nationkey
    )
    SELECT s.c_custkey, CAST(s.c_nationkey AS BIGINT) AS nationkey,
           CAST(s.s AS DOUBLE) AS spend
    FROM spend s JOIN nat n ON n.c_nationkey = s.c_nationkey
    WHERE s.s * n.n_cust * 5 > n.nation_total * 6
    """,
)
def qds_above_nation_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q30 shape: customers spending > 1.2x their nation's
    average customer spend. The aggregate-of-aggregate comparison is
    restated multiplicatively over EXACT decimals (s * n > total * 1.2
    becomes s*n*5 > total*6), so no cross-engine float drift can flip a
    boundary row. Scale shape: two partial-agg groupBys + a broadcast
    join of the per-nation table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("s"))
    )
    nat = spend.groupBy("c_nationkey").agg(
        F.sum("s").alias("nation_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
    )
    return (
        spend.join(F.broadcast(nat), "c_nationkey")
        .filter(
            F.col("s") * F.col("n_cust") * F.lit(5)
            > F.col("nation_total") * F.lit(6)
        )
        .select(
            "c_custkey",
            F.col("c_nationkey").cast("bigint").alias("nationkey"),
            F.col("s").cast("double").alias("spend"),
        )
    )


@_register(
    "qds_basket_affinity",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM pairs GROUP BY part_a, part_b HAVING COUNT(*) >= 2
    """,
)
def qds_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q29 / market-basket shape: part pairs co-purchased in at
    least two DISTINCT orders. (l_orderkey, l_partkey) is deduped
    before the self-join — an order carrying the same part on two
    lineitems would otherwise double-count a pair and a single order
    could clear the >=2 threshold alone. The self-join keys on
    l_orderkey whose fan-out is bounded by the lines-per-order cap
    (<= 7 in TPC-H-shaped data), so pair output is linear in orders —
    the same bounded-key-join argument as the LSH bucket path."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@_register(
    "qds_month_over_month",
    """
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY 1, 2
    ), seq AS (
      SELECT yr, mo, rev,
             LAG(rev) OVER (ORDER BY yr, mo) AS prev_rev
      FROM monthly
    )
    SELECT yr, mo, CAST(rev AS DOUBLE) AS rev,
           CAST(prev_rev AS DOUBLE) AS prev_rev,
           CAST(CASE WHEN prev_rev IS NOT NULL AND rev > prev_rev
                THEN 1 ELSE 0 END AS INTEGER) AS is_up
    FROM seq
    """,
)
def qds_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47's sequential flavor: monthly revenue with LAG over
    the month sequence and an increase flag. The LAG input stays
    DECIMAL (exact) end to end; doubles appear only in the final
    projection casts. Window is over the tiny monthly rollup, not the
    fact table."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
    seq = monthly.withColumn(
        "prev_rev", F.lag("rev").over(Window.orderBy("yr", "mo"))
    )
    return seq.select(
        "yr",
        "mo",
        F.col("rev").cast("double").alias("rev"),
        F.col("prev_rev").cast("double").alias("prev_rev"),
        (F.col("prev_rev").isNotNull() & (F.col("rev") > F.col("prev_rev")))
        .cast("int")
        .alias("is_up"),
    )


@_register(
    "qds_repeat_buyers",
    """
    SELECT o_custkey,
           CAST(COUNT(DISTINCT EXTRACT(year FROM o_orderdate)) AS BIGINT)
             AS n_years,
           CAST(MIN(EXTRACT(year FROM o_orderdate)) AS BIGINT) AS first_yr,
           CAST(MAX(EXTRACT(year FROM o_orderdate)) AS BIGINT) AS last_yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT EXTRACT(year FROM o_orderdate)) >= 3
    """,
)
def qds_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1's returning-customer shape: customers active in three
    or more distinct years, with their activity span. Distinct-count
    over a derived year column — partial aggregation still applies
    (year is low-cardinality per customer)."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.countDistinct(yr).cast("bigint").alias("n_years"),
            F.min(yr).cast("bigint").alias("first_yr"),
            F.max(yr).cast("bigint").alias("last_yr"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .filter(F.col("n_years") >= 3)
    )


@_register(
    "qds_segment_share",
    """
    WITH seg AS (
      SELECT c.c_mktsegment,
             SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS rev
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ), tot AS (
      SELECT c_mktsegment, rev,
             SUM(rev) OVER () AS total_rev
      FROM seg
    )
    SELECT c_mktsegment, CAST(rev AS DOUBLE) AS rev,
           CAST(rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS share
    FROM tot
    """,
)
def qds_segment_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q11's fraction-of-total filter expressed with a window
    sum over the aggregate instead of a scalar subquery — one pass, no
    re-scan. The window sum runs over DECIMAL (exact, order-free);
    share is a single IEEE division of two exact values."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    seg = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
    )
    tot = seg.withColumn(
        "total_rev", F.sum("rev").over(Window.partitionBy())
    )
    return tot.select(
        "c_mktsegment",
        F.col("rev").cast("double").alias("rev"),
        (F.col("rev").cast("double") / F.col("total_rev").cast("double")).alias(
            "share"
        ),
    )
