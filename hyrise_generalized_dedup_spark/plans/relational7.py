"""Seventh tranche: third TPC-DS-shaped batch of query patterns.

Extends relational4/relational6 (reference: README.md:52-61,
src/benchmark/tpcds_benchmark.cpp, resources/benchmark/tpcds) with six
patterns those tranches didn't exercise: top-k WITHIN grouping-set
levels (q67), cumulative cross-channel window comparison (q51),
monthly-deviation-from-yearly-average filters (q47), before/after date
split ratios with multiplicative bounds (q21), multi-window equal-share
overlap joins (q58/q83), and margin-ratio ranking partitioned by
GROUPING level (q36). Same conventions as relational6: re-based onto
the reduced driver schema, DataFrame API so Catalyst picks the plan,
hash-exact vs DuckDB via the full-registry pytest parametrization
(driver slots stay capped at 50), decimal-exact sums, and every ratio
comparison restated multiplicatively over exact integers/decimals or as
a single IEEE division of exact values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .relational import _dsum, _register


@_register(
    "qds_rollup_level_topk",
    """
    WITH agg AS (
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ), ranked AS (
      SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
             gid, qty,
             RANK() OVER (PARTITION BY gid ORDER BY qty DESC, l_returnflag NULLS FIRST,
                          l_linestatus NULLS FIRST) AS rk
      FROM agg
    )
    SELECT rf, ls, gid, qty, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= 3
    """,
)
def qds_rollup_level_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 shape: aggregate over a ROLLUP, then rank WITHIN each
    grouping level (partition by the GROUPING() id) and keep the top 3
    rows per level. One shuffle for the grouping-set expansion, one for
    the rank window — the rollup rows are tiny, so the window never sees
    fact-table volume."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.rollup("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), "qty"),
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("bigint")
        .alias("gid"),
    )
    w = Window.partitionBy("gid").orderBy(
        F.desc("qty"),
        F.col("l_returnflag").asc_nulls_first(),
        F.col("l_linestatus").asc_nulls_first(),
    )
    return (
        agg.withColumn("rk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "gid",
            "qty",
            "rk",
        )
    )


@_register(
    "qds_cumulative_channel_cross",
    """
    WITH o AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) AS mo,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY 1
    ), l AS (
      SELECT EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) AS mo,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS rev
      FROM lineitem GROUP BY 1
    ), oc AS (
      SELECT mo, CAST(SUM(rev) OVER (ORDER BY mo
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum FROM o
    ), lc AS (
      SELECT mo, CAST(SUM(rev) OVER (ORDER BY mo
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum FROM l
    )
    SELECT COALESCE(oc.mo, lc.mo) AS mo, oc.cum AS order_cum, lc.cum AS ship_cum
    FROM oc FULL OUTER JOIN lc ON oc.mo = lc.mo
    WHERE oc.cum > lc.cum OR lc.cum IS NULL OR oc.cum IS NULL
    """,
)
def qds_cumulative_channel_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: two channels aggregated per month, each given a
    cumulative running total, FULL OUTER joined on month, keeping months
    where one channel's cumulative lead holds (or the month exists in
    only one channel). Running sums stay DECIMAL through the window —
    window aggregation order differs across engines (DuckDB uses a
    segment tree), so double accumulation there is NOT bit-stable — and
    cast to double once per output row."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def monthly(df, date_col, val_col):
        return df.groupBy(
            (F.year(date_col) * 100 + F.month(date_col)).alias("mo")
        ).agg(F.sum(F.col(val_col).cast("decimal(38,6)")).alias("rev"))

    w = Window.orderBy("mo").rowsBetween(Window.unboundedPreceding, 0)
    oc = monthly(orders, "o_orderdate", "o_totalprice").select(
        "mo", F.sum("rev").over(w).cast("double").alias("order_cum")
    )
    lc = monthly(li, "l_shipdate", "l_extendedprice").select(
        "mo", F.sum("rev").over(w).cast("double").alias("ship_cum")
    )
    j = oc.join(lc, "mo", "full_outer")
    return j.filter(
        (F.col("order_cum") > F.col("ship_cum"))
        | F.col("ship_cum").isNull()
        | F.col("order_cum").isNull()
    ).select("mo", "order_cum", "ship_cum")


@_register(
    "qds_monthly_deviation",
    """
    WITH m AS (
      SELECT l_returnflag,
             EXTRACT(YEAR FROM l_shipdate) AS yr,
             EXTRACT(MONTH FROM l_shipdate) AS mo,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS rev_dec,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2, 3
    ), s AS (
      SELECT l_returnflag, yr, mo, n,
             CAST(rev_dec AS DOUBLE) AS rev,
             CAST(SUM(rev_dec) OVER (PARTITION BY l_returnflag, yr) AS DOUBLE) AS yr_total,
             COUNT(*) OVER (PARTITION BY l_returnflag, yr) AS n_months
      FROM m
    )
    SELECT l_returnflag, yr, mo, rev, yr_total, CAST(n_months AS BIGINT) AS n_months
    FROM s
    WHERE rev * n_months > yr_total * 1.1 OR rev * n_months < yr_total * 0.9
    """,
)
def qds_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 shape: months whose revenue deviates more than 10%
    from their (flag, year) average. The average is restated
    multiplicatively — rev * n_months vs yr_total * 1.1 — over exact
    decimal sums cast once to double, so no division and no
    engine-specific mean accumulation; 1.1 * an exact double is one IEEE
    multiply on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_returnflag",
        F.year("l_shipdate").alias("yr"),
        F.month("l_shipdate").alias("mo"),
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("rev_dec"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("l_returnflag", "yr")
    s = m.select(
        "l_returnflag",
        "yr",
        "mo",
        F.col("rev_dec").cast("double").alias("rev"),
        F.sum("rev_dec").over(w).cast("double").alias("yr_total"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_months"),
    )
    return s.filter(
        (F.col("rev") * F.col("n_months") > F.col("yr_total") * 1.1)
        | (F.col("rev") * F.col("n_months") < F.col("yr_total") * 0.9)
    ).select("l_returnflag", "yr", "mo", "rev", "yr_total", "n_months")


@_register(
    "qds_before_after_split",
    """
    SELECT s_nationkey,
           COUNT(CASE WHEN l_shipdate <  CAST('1998-06-01' AS DATE) THEN 1 END) AS n_before,
           COUNT(CASE WHEN l_shipdate >= CAST('1998-06-01' AS DATE) THEN 1 END) AS n_after
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    HAVING COUNT(CASE WHEN l_shipdate <  CAST('1998-06-01' AS DATE) THEN 1 END) * 3
             >= COUNT(CASE WHEN l_shipdate >= CAST('1998-06-01' AS DATE) THEN 1 END) * 2
       AND COUNT(CASE WHEN l_shipdate >= CAST('1998-06-01' AS DATE) THEN 1 END) * 3
             >= COUNT(CASE WHEN l_shipdate <  CAST('1998-06-01' AS DATE) THEN 1 END) * 2
    """,
)
def qds_before_after_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q21 shape: per supplier nation, activity split around a
    pivot date must stay within a 2/3..3/2 band. The band test is pure
    integer multiplication (n*3 >= m*2), so there is no ratio rounding
    to disagree on. One broadcast dim join + one map-side-combinable
    conditional-count aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    pivot = F.lit("1998-06-01").cast("date")
    j = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    agg = j.groupBy("s_nationkey").agg(
        F.count(F.when(F.col("l_shipdate") < pivot, 1)).alias("n_before"),
        F.count(F.when(F.col("l_shipdate") >= pivot, 1)).alias("n_after"),
    )
    return agg.filter(
        (F.col("n_before") * 3 >= F.col("n_after") * 2)
        & (F.col("n_after") * 3 >= F.col("n_before") * 2)
    )


@_register(
    "qds_three_window_overlap",
    """
    WITH r AS (
      SELECT l_partkey,
        SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1996
                 THEN CAST(l_extendedprice AS DECIMAL(38,6)) ELSE 0 END) AS w1,
        SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1998
                 THEN CAST(l_extendedprice AS DECIMAL(38,6)) ELSE 0 END) AS w2,
        SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 2000
                 THEN CAST(l_extendedprice AS DECIMAL(38,6)) ELSE 0 END) AS w3
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           CAST(SUM(w1) AS DOUBLE) AS rev1,
           CAST(SUM(w2) AS DOUBLE) AS rev2,
           CAST(SUM(w3) AS DOUBLE) AS rev3
    FROM r JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    HAVING SUM(w1) * 4 >= (SUM(w1) + SUM(w2) + SUM(w3))
       AND SUM(w2) * 4 >= (SUM(w1) + SUM(w2) + SUM(w3))
       AND SUM(w3) * 4 >= (SUM(w1) + SUM(w2) + SUM(w3))
    """,
)
def qds_three_window_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58/q83 shape: revenue per brand in three disjoint year
    windows, keeping brands where every window carries at least a 1/4
    share of the three-window total (the 'roughly equal across channels'
    test). Shares are integer-free decimal comparisons (w*4 >= total),
    exact on both engines. Fact aggregated BEFORE the dim join — partial
    aggregation on l_partkey collapses the join input."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def wsum(yr, alias):
        return F.sum(
            F.when(
                F.year("l_shipdate") == yr,
                F.col("l_extendedprice").cast("decimal(38,6)"),
            ).otherwise(F.lit(0).cast("decimal(38,6)"))
        ).alias(alias)

    r = li.groupBy("l_partkey").agg(wsum(1996, "w1"), wsum(1998, "w2"), wsum(2000, "w3"))
    j = r.join(F.broadcast(part), r.l_partkey == part.p_partkey)
    agg = j.groupBy("p_brand").agg(
        F.sum("w1").alias("s1"), F.sum("w2").alias("s2"), F.sum("w3").alias("s3")
    )
    total = F.col("s1") + F.col("s2") + F.col("s3")
    return agg.filter(
        (F.col("s1") * 4 >= total) & (F.col("s2") * 4 >= total) & (F.col("s3") * 4 >= total)
    ).select(
        "p_brand",
        F.col("s1").cast("double").alias("rev1"),
        F.col("s2").cast("double").alias("rev2"),
        F.col("s3").cast("double").alias("rev3"),
    )


@_register(
    "qds_margin_rank_by_level",
    """
    WITH agg AS (
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_dec,
             COUNT(*) AS n
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    )
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           gid,
           CAST(rev_dec AS DOUBLE) / n AS avg_price,
           CAST(RANK() OVER (PARTITION BY gid
                ORDER BY CAST(rev_dec AS DOUBLE) / n DESC,
                         o_orderstatus NULLS FIRST,
                         o_orderpriority NULLS FIRST) AS BIGINT) AS rk
    FROM agg
    """,
)
def qds_margin_rank_by_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36 shape: a margin-like ratio (average order price)
    ranked within each ROLLUP grouping level. The ratio is ONE IEEE
    division of an exact decimal-sum (cast to double) by an exact count
    — correctly rounded identically on both engines — and the rank's
    order-by carries NULLS FIRST tie-breaks so level-internal order is
    total."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev_dec"),
        F.count(F.lit(1)).alias("n"),
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
        .cast("bigint")
        .alias("gid"),
    )
    avg_price = (F.col("rev_dec").cast("double") / F.col("n")).alias("avg_price")
    w = Window.partitionBy("gid").orderBy(
        (F.col("rev_dec").cast("double") / F.col("n")).desc(),
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
    )
    return agg.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "gid",
        avg_price,
        F.rank().over(w).cast("bigint").alias("rk"),
    )
