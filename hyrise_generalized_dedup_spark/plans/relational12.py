"""Twelfth tranche: eighth TPC-DS-shaped batch of query patterns.

Extends relational4/6/7/8/9/10/11 (reference: README.md:52-61,
src/benchmark/tpcds_benchmark.cpp, resources/benchmark/tpcds) with six
patterns still uncovered: a cohort retention matrix (first-order month x
month offset), NTILE-based RFM customer segmentation, exact-quartile IQR
outlier counts via rank arithmetic, an event time-to-convert latency
histogram (first purchase strictly after first view), market-basket
lift over brand pairs (distinct-order supports, the affinity census's
ratio-bearing sibling), and monthly revenue vs the running best month.
Same conventions: DataFrame API so Catalyst plans it, hash-exact vs
DuckDB via the full-registry pytest parametrization, DECIMAL-exact
sums, ties broken by a unique key before any ranking, floor() pinned on
both engines for any double->int bucketing, one IEEE division per
ratio.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .relational import _register


@_register(
    "qds_retention_matrix",
    """
    WITH om AS (
      SELECT o_custkey,
             EXTRACT(YEAR FROM o_orderdate) * 12
               + EXTRACT(MONTH FROM o_orderdate) AS ym
      FROM orders
    ), cohort AS (
      SELECT o_custkey, MIN(ym) AS cohort_ym FROM om GROUP BY o_custkey
    )
    SELECT c.cohort_ym AS cohort_ym,
           om.ym - c.cohort_ym AS month_offset,
           CAST(COUNT(DISTINCT om.o_custkey) AS BIGINT) AS n_active
    FROM om JOIN cohort c ON om.o_custkey = c.o_custkey
    WHERE om.ym - c.cohort_ym <= 6
    GROUP BY c.cohort_ym, om.ym - c.cohort_ym
    """,
)
def qds_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month, counted
    as active at each month offset (capped at 6 for a bounded report).
    Month key = year*12+month (integer arithmetic, no interval types
    cross-engine). Two aggregations + one key join — the cohort side is
    one row per customer, so the join never exceeds the order count."""
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("ym"),
    )
    cohort = om.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    joined = om.join(cohort, "o_custkey")
    offset = (F.col("ym") - F.col("cohort_ym")).alias("month_offset")
    return (
        joined.filter((F.col("ym") - F.col("cohort_ym")) <= 6)
        .groupBy("cohort_ym", offset)
        .agg(F.countDistinct("o_custkey").cast("long").alias("n_active"))
    )


@_register(
    "qds_rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS spend
      FROM orders GROUP BY o_custkey
    ), tiled AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY spend DESC, o_custkey) AS m
      FROM base
    )
    SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM tiled GROUP BY r, f, m
    """,
)
def qds_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles via NTILE
    (each ordering tie-broken by custkey so the tiling is total), then a
    census per (r, f, m) cell. One groupBy to one-row-per-customer, three
    windows over that compact frame, one census groupBy."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("spend"),
    )
    tiled = base.select(
        "o_custkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order").desc(), "o_custkey"))
        .alias("r"),
        F.ntile(4)
        .over(Window.orderBy(F.col("n_orders").desc(), "o_custkey"))
        .alias("f"),
        F.ntile(4)
        .over(Window.orderBy(F.col("spend").desc(), "o_custkey"))
        .alias("m"),
    )
    return tiled.groupBy("r", "f", "m").agg(
        F.count("*").cast("long").alias("n_customers")
    )


@_register(
    "qds_iqr_outliers",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), quartiles AS (
      SELECT l_returnflag,
             MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)
                                          * CAST(0.25 AS DOUBLE)) AS BIGINT)
                      THEN l_extendedprice END) AS p25,
             MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)
                                          * CAST(0.75 AS DOUBLE)) AS BIGINT)
                      THEN l_extendedprice END) AS p75
      FROM ranked GROUP BY l_returnflag
    )
    SELECT l.l_returnflag AS l_returnflag,
           CAST(q.p25 AS DOUBLE) AS p25, CAST(q.p75 AS DOUBLE) AS p75,
           CAST(SUM(CASE WHEN l.l_extendedprice
                              < q.p25 - (q.p75 - q.p25) * 1.5
                          OR l.l_extendedprice
                              > q.p75 + (q.p75 - q.p25) * 1.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l JOIN quartiles q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag, q.p25, q.p75
    """,
)
def qds_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quartile IQR outlier count per return flag: p25/p75 picked
    by rank arithmetic (type-1 quantile at ceil(q*n), fully ordered by
    (price, orderkey, linenumber) so both engines agree bit-exactly — no
    percentile builtins, whose interpolation differs), then a Tukey-fence
    recount. Price arithmetic stays on the parquet doubles with exact
    *1.5 scaling. Two passes over lineitem with a 3-row broadcast join
    between them."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    qtile = lambda frac: F.max(  # noqa: E731
        F.when(
            F.col("rn")
            == F.ceil(F.col("n").cast("double") * F.lit(frac).cast("double")).cast(
                "long"
            ),
            F.col("l_extendedprice"),
        )
    )
    quart = ranked.groupBy("l_returnflag").agg(
        qtile(0.25).alias("p25"), qtile(0.75).alias("p75")
    )
    iqr = F.col("p75") - F.col("p25")
    outlier = (F.col("l_extendedprice") < F.col("p25") - iqr * 1.5) | (
        F.col("l_extendedprice") > F.col("p75") + iqr * 1.5
    )
    return (
        li.join(F.broadcast(quart), "l_returnflag")
        .groupBy("l_returnflag", "p25", "p75")
        .agg(F.sum(outlier.cast("long")).alias("n_outliers"))
        .select(
            "l_returnflag",
            F.col("p25").cast("double").alias("p25"),
            F.col("p75").cast("double").alias("p75"),
            "n_outliers",
        )
    )


@_register(
    "evt_time_to_convert",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS vts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS pts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), lat AS (
      SELECT (EXTRACT(DAY FROM p.pts) - EXTRACT(DAY FROM v.vts)) * 24
             + (EXTRACT(HOUR FROM p.pts) - EXTRACT(HOUR FROM v.vts))
               AS hours
      FROM v JOIN p ON v.user_id = p.user_id
    )
    SELECT CAST(floor(CAST(hours AS DOUBLE) / CAST(24 AS DOUBLE))
                AS BIGINT) AS day_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(hours) AS BIGINT) AS min_hours,
           CAST(MAX(hours) AS BIGINT) AS max_hours
    FROM lat GROUP BY 1
    """,
)
def evt_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert histogram: per user, first view -> first purchase
    STRICTLY after it, latency in whole hours (day/hour extraction —
    integer cross-engine arithmetic; the fixture spans one month so day
    math is exact), bucketed per day. The sequential constraint is the
    funnel's, the deliverable is the latency distribution. Two per-user
    aggs + one key join; no window over raw events."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    lat = v.join(p, "user_id").select(
        (
            (F.dayofmonth("pts") - F.dayofmonth("vts")) * 24
            + (F.hour("pts") - F.hour("vts"))
        ).alias("hours")
    )
    bucket = F.floor(
        F.col("hours").cast("double") / F.lit(24).cast("double")
    ).cast("long")
    return lat.groupBy(bucket.alias("day_bucket")).agg(
        F.count("*").cast("long").alias("n_users"),
        F.min("hours").cast("long").alias("min_hours"),
        F.max("hours").cast("long").alias("max_hours"),
    )


@_register(
    "qds_brand_basket_lift",
    """
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), tot AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob
    ), support AS (
      SELECT p_brand, COUNT(*) AS n FROM ob GROUP BY p_brand
    ), pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             COUNT(*) AS n_both
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
    )
    SELECT pr.brand_a, pr.brand_b,
           CAST(pr.n_both AS BIGINT) AS n_both,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           (CAST(pr.n_both AS DOUBLE) * CAST(t.n_orders AS DOUBLE))
             / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
    FROM pairs pr
    JOIN support sa ON pr.brand_a = sa.p_brand
    JOIN support sb ON pr.brand_b = sb.p_brand
    CROSS JOIN tot t
    WHERE pr.n_both >= 3
    """,
)
def qds_brand_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift over brand pairs: distinct (order, brand)
    first (the affinity census's row-pair bug class is designed out),
    self-join on the order key with brand_a < brand_b, then lift =
    P(both) / (P(a) * P(b)) as one IEEE expression. The distinct
    projection bounds the self-join at (brands per order choose 2);
    supports and the scalar total broadcast onto the pair census."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ob = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    tot = ob.select(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    support = ob.groupBy("p_brand").agg(F.count("*").alias("n"))
    a = ob.toDF("l_orderkey", "brand_a")
    b = ob.toDF("l_orderkey", "brand_b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    sa = support.toDF("brand_a", "n_a")
    sb = support.toDF("brand_b", "n_b")
    out = (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(tot))
    )
    lift = (
        F.col("n_both").cast("double") * F.col("n_orders").cast("double")
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return out.select(
        "brand_a",
        "brand_b",
        F.col("n_both").cast("long").alias("n_both"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        lift.alias("lift"),
    )


@_register(
    "qds_running_best_month",
    """
    WITH monthly AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) * 12
               + EXTRACT(MONTH FROM o_orderdate) AS ym,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT ym,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(MAX(rev) OVER (ORDER BY ym
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS DOUBLE) AS best_so_far,
           CAST(rev AS DOUBLE)
             / CAST(MAX(rev) OVER (ORDER BY ym
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS DOUBLE)
             AS frac_of_best
    FROM monthly
    """,
)
def qds_running_best_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue vs the running best month: DECIMAL-exact monthly
    sums, a running MAX window (order-insensitive under DECIMAL, unlike
    running SUMs of doubles), and one IEEE division at the end. The
    global window runs over one row per month — pre-aggregation keeps
    the single-partition window trivially small at any order count."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
    w = Window.orderBy("ym").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    best = F.max("rev").over(w).cast("double")
    return monthly.select(
        "ym",
        F.col("rev").cast("double").alias("revenue"),
        best.alias("best_so_far"),
        (F.col("rev").cast("double") / best).alias("frac_of_best"),
    )
