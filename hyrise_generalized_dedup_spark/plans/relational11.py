"""Eleventh tranche: seventh TPC-DS-shaped batch of query patterns.

Extends relational4/6/7/8/9/10 (reference: README.md:52-61,
src/benchmark/tpcds_benchmark.cpp, resources/benchmark/tpcds) with six
patterns still uncovered: Pareto coverage (the minimal top-spender set
reaching half of revenue — running-share threshold with the boundary
row included), exact median via rank arithmetic (no percentile
builtins, so the shape is engine-portable), a month-spine fill that
materializes zero rows for inactive (month, status) cells (q66's
sparse-report flavor), per-customer activity spans from first/last
order months, LEFT-JOIN zero-preserving counts (COUNT(col) vs COUNT(*)
NULL semantics), and the three ranking functions side by side over a
tie-free key. Same conventions: DataFrame API so Catalyst plans it,
hash-exact vs DuckDB via the full-registry pytest parametrization,
DECIMAL-exact sums, ties always broken by a unique key before any
ranking, one IEEE division per ratio.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .relational import _register


@_register(
    "qds_pareto_half_revenue",
    """
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS s
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, s,
             SUM(s) OVER (ORDER BY s DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run,
             SUM(s) OVER () AS tot
      FROM spend
    )
    SELECT o_custkey, CAST(s AS DOUBLE) AS spend,
           CAST(run AS DOUBLE) AS running_spend
    FROM ranked
    WHERE run - s < tot * CAST(0.5 AS DECIMAL(38,6))
    """,
)
def qds_pareto_half_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto coverage: the minimal prefix of customers (by spend desc,
    custkey tiebreak) whose running total reaches 50% of revenue — the
    boundary customer is included via the `run - s < tot/2` form (their
    PRIOR running total is still short of half). All window math stays
    DECIMAL so the threshold comparison is exact cross-engine. One
    groupBy + one global-order window: the single-partition window is
    the inherent cost of a global prefix — at scale you'd pre-aggregate
    to one row per customer first, which this plan does."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("s")
    )
    w_run = Window.orderBy(F.col("s").desc(), F.col("o_custkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy()
    ranked = spend.select(
        "o_custkey",
        "s",
        F.sum("s").over(w_run).alias("run"),
        F.sum("s").over(w_tot).alias("tot"),
    )
    half = F.col("tot") * F.lit(0.5).cast("decimal(38,6)")
    return ranked.filter((F.col("run") - F.col("s")) < half).select(
        "o_custkey",
        F.col("s").cast("double").alias("spend"),
        F.col("run").cast("double").alias("running_spend"),
    )


@_register(
    "qds_exact_median_rank",
    """
    WITH r AS (
      SELECT o_orderstatus,
             CAST(o_totalprice AS DECIMAL(38,6)) AS p,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS median_price,
           CAST(MAX(n) AS BIGINT) AS n_orders
    FROM r
    WHERE rn * 2 IN (n, n + 1, n + 2)
    GROUP BY o_orderstatus
    """,
)
def qds_exact_median_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median without percentile builtins (whose interpolation
    rules differ across engines): rank by price with a unique-key
    tiebreak, keep the middle one (odd n: 2rn = n+1) or two (even n:
    2rn ∈ {n, n+2}) rows, average them. Equal prices make the middle
    VALUE invariant to tie order, so the tiebreak only pins the plan,
    not the answer. One window + one partial-agg groupBy, both keyed on
    o_orderstatus."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderstatus")
    r = o.select(
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(38,6)").alias("p"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mid = (F.col("rn") * 2 == F.col("n")) | (
        F.col("rn") * 2 == F.col("n") + 1
    ) | (F.col("rn") * 2 == F.col("n") + 2)
    return (
        r.filter(mid)
        .groupBy("o_orderstatus")
        .agg(
            (F.sum("p").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "median_price"
            ),
            F.max("n").cast("long").alias("n_orders"),
        )
    )


@_register(
    "qds_month_spine_fill",
    """
    WITH months AS (
      SELECT DISTINCT CAST(EXTRACT(YEAR FROM o_orderdate) * 100
                           + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym
      FROM orders
    ), statuses AS (
      SELECT DISTINCT o_orderstatus FROM orders
    ), cells AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100
                  + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
             o_orderstatus, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT m.ym, s.o_orderstatus,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders,
           CAST(CASE WHEN c.ym IS NULL THEN 1 ELSE 0 END AS INTEGER) AS filled
    FROM months m CROSS JOIN statuses s
    LEFT JOIN cells c ON c.ym = m.ym AND c.o_orderstatus = s.o_orderstatus
    """,
)
def qds_month_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-report spine fill (TPC-DS q66 flavor): every (month,
    status) cell appears, inactive cells as explicit zero rows with a
    fill marker — the shape reporting layers need and plain groupBy
    cannot produce. The spine is a cross join of two TINY distinct sets
    (months x statuses — both dimension-sized, so the cross join is
    broadcastable at any fact-table scale); facts left-join onto it."""
    o = load_table(spark, sf_dir, "orders")
    ym = (
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    )
    months = o.select(ym).distinct()
    statuses = o.select("o_orderstatus").distinct()
    cells = (
        o.select(ym, "o_orderstatus")
        .groupBy("ym", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumnRenamed("ym", "c_ym")
        .withColumnRenamed("o_orderstatus", "c_st")
    )
    spine = months.crossJoin(statuses)
    j = spine.join(
        cells,
        (F.col("ym") == F.col("c_ym"))
        & (F.col("o_orderstatus") == F.col("c_st")),
        "left",
    )
    return j.select(
        "ym",
        "o_orderstatus",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        F.col("c_ym").isNull().cast("int").alias("filled"),
    )


@_register(
    "qds_customer_activity_span",
    """
    WITH m AS (
      SELECT o_custkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) * 12
                  + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mi
      FROM orders
    )
    SELECT o_custkey,
           CAST(MIN(mi) AS BIGINT) AS first_month,
           CAST(MAX(mi) AS BIGINT) AS last_month,
           CAST(MAX(mi) - MIN(mi) + 1 AS BIGINT) AS span_months,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(MAX(mi) - MIN(mi) + 1 AS DOUBLE) AS orders_per_month
    FROM m GROUP BY o_custkey
    HAVING MAX(mi) - MIN(mi) + 1 >= 24
    """,
)
def qds_customer_activity_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer activity span from first/last order month (integer
    month index, so the span arithmetic is engine-portable — no
    date_diff dialect), with order density over the active span. One
    partial-agg groupBy on o_custkey; long-tenured customers only."""
    o = load_table(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    g = o.select("o_custkey", mi.alias("mi")).groupBy("o_custkey").agg(
        F.min("mi").alias("first_month"),
        F.max("mi").alias("last_month"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    span = F.col("last_month") - F.col("first_month") + 1
    return (
        g.select(
            "o_custkey",
            "first_month",
            "last_month",
            span.cast("long").alias("span_months"),
            F.col("n_orders").cast("long").alias("n_orders"),
            (F.col("n_orders").cast("double") / span.cast("double")).alias(
                "orders_per_month"
            ),
        )
        .filter(F.col("span_months") >= 24)
    )


@_register(
    "qds_zero_preserving_counts",
    """
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders_1997,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CASE WHEN COUNT(o.o_orderkey) = 0 THEN 1 ELSE 0 END
                AS INTEGER) AS inactive_1997
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    WHERE c.c_custkey <= 300
    GROUP BY c.c_custkey
    """,
)
def qds_zero_preserving_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(col) vs COUNT(*) NULL semantics over a filtered LEFT JOIN:
    customers with no 1997 orders keep a row (COUNT(*) counts the
    null-extended row, COUNT(o_orderkey) does not) — the zero-preserving
    report shape an inner join silently loses. The date filter lives in
    the JOIN CONDITION, not the WHERE (moving it would turn the join
    inner): the semantics the SQL sweep can't isolate as sharply."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    j = c.join(o, cond, "left")
    return j.groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("long").alias("n_orders_1997"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count("o_orderkey") == 0).cast("int").alias("inactive_1997"),
    )


@_register(
    "qds_rank_family_compare",
    """
    WITH spend AS (
      SELECT c_mktsegment, o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_custkey
    )
    SELECT c_mktsegment, o_custkey,
           CAST(row_number() OVER (PARTITION BY c_mktsegment
                 ORDER BY total DESC, o_custkey) AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY c_mktsegment
                 ORDER BY total DESC, o_custkey) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY c_mktsegment
                 ORDER BY total DESC, o_custkey) AS BIGINT) AS drnk
    FROM spend
    QUALIFY row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY total DESC, o_custkey) <= 8
    """,
)
def qds_rank_family_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number vs rank vs dense_rank side by side over one tie-free
    ordering (DECIMAL total desc, custkey tiebreak — so all three agree
    unless totals tie, and the tiebreak pins determinism either way),
    top 8 per segment. One window specification shared by all three
    functions: Catalyst evaluates them in a single Window operator, no
    extra exchange per function."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("total"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total").desc(), F.col("o_custkey")
    )
    return (
        spend.select(
            "c_mktsegment",
            "o_custkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 8)
        .select("c_mktsegment", "o_custkey", "rn", "rnk", "drnk")
    )
