"""Tenth tranche: sixth TPC-DS-shaped batch of query patterns.

Extends relational4/6/7/8/9 (reference: README.md:52-61,
src/benchmark/tpcds_benchmark.cpp, resources/benchmark/tpcds) with six
patterns the earlier tranches don't exercise: gaps-and-islands streak
detection (month_index − row_number grouping — the classic sequential
shape no prior tranche has), per-channel conditional DISTINCT counting
(COUNT(DISTINCT CASE …) — q35's multi-channel distinct flavor), lag-based
inter-order gap statistics over raw rows (q74's sequencing restated at
row grain), a full-outer merge of two independently aggregated channels
with coalesced keys (sparse-month union, q80's channel-merge flavor),
RANK-with-ties top-k per group (tie-inclusive, unlike the row_number
top-k in relational2), and explicit GROUPING SETS with per-column
grouping flags (q27's grouping-id reporting; Spark side is the literal
union-of-groupings expansion Catalyst itself performs, the oracle uses
DuckDB's native GROUPING SETS). Same conventions as the earlier
tranches: DataFrame API so Catalyst plans it, hash-exact vs DuckDB via
the full-registry pytest parametrization, DECIMAL-exact sums, dates
compared at DATE grain (timestamps are cast before any day arithmetic),
every ratio a single IEEE division over exact values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .relational import _dsum, _register


@_register(
    "qds_streak_islands",
    """
    WITH months AS (
      SELECT DISTINCT o_custkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) * 12
                  + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m
      FROM orders
    ), grp AS (
      SELECT o_custkey, m,
             m - row_number() OVER (PARTITION BY o_custkey ORDER BY m)
               AS island
      FROM months
    ), islands AS (
      SELECT o_custkey, island, COUNT(*) AS len
      FROM grp GROUP BY o_custkey, island
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak_months
    FROM islands
    GROUP BY o_custkey
    HAVING MAX(len) >= 3
    """,
)
def qds_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: customers with >=3 consecutive active months.
    month_index − row_number is constant within a consecutive run, so
    one window + two partial-agg groupBys find every streak — no
    self-join, no iteration. All three shuffles key on o_custkey (the
    window and both groupBys reuse the same hash partitioning), so the
    shape is one exchange at any scale."""
    o = load_table(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    grp = months.select(
        "o_custkey", "m", (F.col("m") - F.row_number().over(w)).alias("island")
    )
    islands = grp.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("longest_streak_months"),
        )
        .filter(F.col("longest_streak_months") >= 3)
    )


@_register(
    "qds_conditional_distinct",
    """
    SELECT c_nationkey,
           CAST(COUNT(DISTINCT CASE WHEN o_orderpriority = '1-URGENT'
                                    THEN o_custkey END) AS BIGINT)
             AS n_urgent_custs,
           CAST(COUNT(DISTINCT CASE WHEN o_orderpriority = '5-LOW'
                                    THEN o_custkey END) AS BIGINT)
             AS n_low_custs,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def qds_conditional_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-channel distinct counting (TPC-DS q35 flavor): per nation,
    distinct customers seen in each priority channel plus overall —
    three DISTINCT aggregates over one scan. CASE-inside-DISTINCT
    excludes non-matching rows via NULL in both engines. The customer
    side is a broadcast (dimension-sized); the distinct expansion is
    Catalyst's expand-then-partial-agg, keyed on c_nationkey."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_custkey"))
    low = F.when(F.col("o_orderpriority") == "5-LOW", F.col("o_custkey"))
    return j.groupBy("c_nationkey").agg(
        F.count_distinct(urgent).cast("long").alias("n_urgent_custs"),
        F.count_distinct(low).cast("long").alias("n_low_custs"),
        F.count_distinct(F.col("o_custkey")).cast("long").alias("n_custs"),
    )


@_register(
    "qds_order_gaps_lag",
    """
    WITH seq AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS d,
             lag(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d
      FROM orders
    ), gaps AS (
      SELECT o_custkey, date_diff('day', prev_d, d) AS gap
      FROM seq WHERE prev_d IS NOT NULL
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days,
           CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_gap_days
    FROM gaps
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
)
def qds_order_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics at row grain: lag() the previous order
    date per customer (o_orderkey tiebreak makes same-day sequences
    deterministic), diff in days, aggregate per customer. One window +
    one groupBy, both keyed on o_custkey — a single exchange. The avg
    is integer-sum / integer-count with one final IEEE division."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy(d, F.col("o_orderkey"))
    seq = o.select(
        "o_custkey", d.alias("d"), F.lag(d).over(w).alias("prev_d")
    )
    gaps = seq.filter(F.col("prev_d").isNotNull()).select(
        "o_custkey", F.datediff("d", "prev_d").alias("gap")
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.max("gap").cast("long").alias("max_gap_days"),
            (
                F.sum("gap").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_gap_days"),
        )
        .filter(F.col("n_gaps") >= 3)
    )


@_register(
    "qds_channel_month_merge",
    """
    WITH op AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100
                  + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
    ), fin AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100
                  + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    )
    SELECT coalesce(op.ym, fin.ym) AS ym,
           CAST(coalesce(op.rev, CAST(0 AS DECIMAL(38,6))) AS DOUBLE)
             AS open_rev,
           CAST(coalesce(fin.rev, CAST(0 AS DECIMAL(38,6))) AS DOUBLE)
             AS fin_rev,
           CAST(CASE WHEN op.ym IS NULL OR fin.ym IS NULL
                THEN 1 ELSE 0 END AS INTEGER) AS sparse_month
    FROM op FULL OUTER JOIN fin ON op.ym = fin.ym
    """,
)
def qds_channel_month_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse channel merge (TPC-DS q80 flavor): two independently
    aggregated status channels full-outer joined on month with coalesced
    keys, flagging months present in only one channel. Each branch is a
    partial-agg groupBy on a ~bigint month key; the outer join carries
    one row per month — driver-light at any corpus size. Sums stay
    DECIMAL until the final double cast."""
    o = load_table(spark, sf_dir, "orders")
    ym = (
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    )
    dec = F.col("o_totalprice").cast("decimal(38,6)")

    def channel(status: str, out: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderstatus") == status)
            .select(ym, dec.alias("p"))
            .groupBy("ym")
            .agg(F.sum("p").alias(out))
        )

    op = channel("O", "open_rev_d")
    fin = channel("F", "fin_rev_d")
    zero = F.lit(0).cast("decimal(38,6)")
    j = op.alias("op").join(
        fin.alias("fin"), F.col("op.ym") == F.col("fin.ym"), "full_outer"
    )
    return j.select(
        F.coalesce(F.col("op.ym"), F.col("fin.ym")).alias("ym"),
        F.coalesce(F.col("op.open_rev_d"), zero).cast("double").alias("open_rev"),
        F.coalesce(F.col("fin.fin_rev_d"), zero).cast("double").alias("fin_rev"),
        (F.col("op.ym").isNull() | F.col("fin.ym").isNull())
        .cast("int")
        .alias("sparse_month"),
    )


@_register(
    "qds_rank_ties_topk",
    """
    WITH spend AS (
      SELECT c_mktsegment, o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_custkey
    ), ranked AS (
      SELECT c_mktsegment, o_custkey, total,
             rank() OVER (PARTITION BY c_mktsegment
                          ORDER BY total DESC) AS rnk
      FROM spend
    )
    SELECT c_mktsegment, o_custkey,
           CAST(total AS DOUBLE) AS total_spend,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def qds_rank_ties_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-inclusive top-k per group: RANK() (not row_number) keeps every
    customer tied at the boundary, so the result set is deterministic
    even under equal spends — the semantics the row_number top-k in
    relational2 cannot give. Ranking orders by the DECIMAL-exact total
    (bit-stable cross-engine), cast to double only in the projection."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("total"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("total").desc())
    return (
        spend.select(
            "c_mktsegment",
            "o_custkey",
            "total",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
        .select(
            "c_mktsegment",
            "o_custkey",
            F.col("total").cast("double").alias("total_spend"),
            "rnk",
        )
    )


@_register(
    "qds_grouping_sets_report",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
    """,
)
def qds_grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with per-column grouping flags (TPC-DS q27
    reporting shape). The Spark side is the union-of-groupings expansion
    Catalyst itself performs for grouping sets — three partial-agg
    groupBys over one scan, each branch tagging its literal GROUPING()
    flags; the oracle exercises DuckDB's native GROUPING SETS, so the
    comparison checks the expansion semantics end-to-end. ALL-sentinel
    coalescing keeps keys NULL-free for stable cross-engine hashing."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(38,6)")

    def branch(by: list[str]) -> DataFrame:
        agg = li.groupBy(*by).agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        rf = F.col("l_returnflag") if "l_returnflag" in by else F.lit("ALL")
        ls = F.col("l_linestatus") if "l_linestatus" in by else F.lit("ALL")
        return agg.select(
            rf.alias("returnflag"),
            ls.alias("linestatus"),
            F.lit(0 if "l_returnflag" in by else 1).alias("g_flag"),
            F.lit(0 if "l_linestatus" in by else 1).alias("g_status"),
            "sum_qty",
            "n",
        )

    both = branch(["l_returnflag", "l_linestatus"])
    flag_only = branch(["l_returnflag"])
    status_only = branch(["l_linestatus"])
    return both.unionByName(flag_only).unionByName(status_only)
