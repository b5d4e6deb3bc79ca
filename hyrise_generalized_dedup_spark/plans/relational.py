"""Relational operator coverage as declarative Catalyst plans.

One query per operator family from the reference inventory (SURVEY.md §2;
reference operators under /root/reference/src/lib/operators/). Instead of
re-implementing TableScan/JoinHash/AggregateHash/Sort/... imperatively, each
capability is expressed as a DataFrame/SQL plan and Catalyst picks the
physical strategy — broadcast vs shuffled hash vs sort-merge join, partial
aggregation, TakeOrderedAndProject, predicate pushdown into the parquet scan.

Every query here has a matching DuckDB oracle in ``RELATIONAL_ORACLES``
(driver correctness gate). Cross-engine float determinism: double sums are
cast to DECIMAL(38,6) per row, summed exactly, and the total cast back to
DOUBLE — bit-identical in Spark and DuckDB. AVG/STDDEV are derived from the
exact decimal sums in double arithmetic, never from the engines' native
order-dependent accumulators.

Scale notes (100 TB design intent, verified via .explain on local runs):
- dimension joins (region/nation/customer/supplier/part) are broadcast;
- fact-fact joins (orders⋈lineitem) shuffle on the join key only after
  filters are pushed below the exchange;
- all scans prune columns (ReadSchema) and push filters (PushedFilters).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

RELATIONAL_QUERIES: dict[str, QueryFn] = {}
RELATIONAL_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        RELATIONAL_QUERIES[name] = fn
        if oracle is not None:
            RELATIONAL_ORACLES[name] = oracle
        return fn

    return deco


def _dsum(col, alias):
    """Exact cross-engine double sum: per-row cast to DECIMAL(38,6), exact sum,
    cast back to double."""
    return F.sum(col.cast("decimal(38,6)")).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# Aggregation (reference: AggregateHash, src/lib/operators/aggregate_hash.cpp;
# functions Min..StdDev at src/lib/expression/aggregate_expression.hpp:13)
# ---------------------------------------------------------------------------

@_register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash aggregate with 8 aggregates.

    Spark runs partial+final hash aggregation automatically (the reference's
    AggregateHash has no partial/final split — single node)."""
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "q_agg_minmax_distinct",
    """
    SELECT o_orderstatus,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_minmax_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/Max/CountDistinct (exact, like the reference's robin_set-based
    COUNT DISTINCT, aggregate_hash.hpp:66-80 — no HLL)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@_register(
    "q_agg_stddev",
    """
    SELECT l_returnflag,
           SQRT((CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                   * CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardDeviationSample via exact decimal moments (cross-engine
    deterministic, unlike native stddev_samp whose FP accumulation order
    differs per engine). Reference: StandardDeviationSample aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    sum_q = F.sum(q.cast("decimal(38,6)")).cast("double")
    sum_q2 = F.sum((q * q).cast("decimal(38,6)")).cast("double")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        F.sqrt((sum_q2 - sum_q * sum_q / n) / (n - F.lit(1))).alias("stddev_qty"),
        n.alias("n"),
    )


@_register(
    "q_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — absent from the reference (SURVEY §2.4: no grouping sets);
    Spark has it built in, included for engine completeness."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("o_totalprice"), "total"),
    )


# ---------------------------------------------------------------------------
# Scans / predicates (reference: TableScan impls,
# src/lib/operators/table_scan.cpp:374-455)
# ---------------------------------------------------------------------------

@_register(
    "q6_filtered_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q6_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive range predicates + BETWEEN, all pushed to
    the parquet scan (reference analogs: ColumnVsValue / ColumnBetween scan
    impls, table_scan.cpp:380-443; pushdown = ChunkPruningRule analog)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "q_like_scan",
    """
    SELECT p_brand, COUNT(*) AS n
    FROM part
    WHERE p_name LIKE '%gear%' AND p_type NOT LIKE 'PROMO%'
    GROUP BY p_brand
    """,
)
def q_like_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE (reference: ColumnLikeTableScanImpl + LikeMatcher
    prefix fast paths, expression/evaluation/like_matcher.hpp:17-51; Catalyst
    LikeSimplification does the same rewrite)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%gear%") & ~F.col("p_type").like("PROMO%"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "q_null_or_scan",
    """
    SELECT COUNT(*) AS n_all,
           COUNT(value) AS n_nonnull,
           COUNT(*) FILTER (WHERE value IS NULL) AS n_null
    FROM events
    WHERE event_type = 'error' OR value > 90
    """,
)
def q_null_or_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL scan + disjunctive predicate (reference:
    ColumnIsNullTableScanImpl at table_scan.cpp:399; OR handled via
    UnionPositions, union_positions.hpp:13-14 — in Spark a single filter)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter((F.col("event_type") == "error") | (F.col("value") > 90)).agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count("value").alias("n_nonnull"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null"),
    )


@_register(
    "q_in_list_scan",
    """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 11) AND c_mktsegment NOT IN ('BUILDING')
    GROUP BY c_mktsegment
    """,
)
def q_in_list_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (...) literal-list scan (reference: InExpressionRewriteRule,
    in_expression_rewrite_rule.hpp:9-39; Catalyst OptimizeIn)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 11) & ~F.col("c_mktsegment").isin("BUILDING"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Projection / expressions (reference: Projection, ExpressionEvaluator,
# src/lib/expression/evaluation/expression_evaluator.cpp)
# ---------------------------------------------------------------------------

@_register(
    "q_case_arith_projection",
    """
    SELECT o_orderkey,
           o_totalprice * 1.1 + 5 AS adj_price,
           o_totalprice * 1.1 + 5 - (o_totalprice * 1.1 + 5) % 10 AS bucket10,
           CASE WHEN o_totalprice > 50000 THEN 'high'
                WHEN o_totalprice > 20000 THEN 'mid'
                ELSE 'low' END AS price_band,
           -o_custkey AS neg_cust,
           CAST(o_orderkey AS VARCHAR) AS key_str
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def q_case_arith_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic +,-,*,%, CASE WHEN, unary minus, CAST (reference:
    arithmetic_expression.hpp, case_expression.hpp, cast_expression.hpp,
    unary_minus_expression.hpp)."""
    o = load_table(spark, sf_dir, "orders")
    adj = F.col("o_totalprice") * 1.1 + 5
    return o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        adj.alias("adj_price"),
        (adj - adj % 10).alias("bucket10"),
        F.when(F.col("o_totalprice") > 50000, "high")
        .when(F.col("o_totalprice") > 20000, "mid")
        .otherwise("low")
        .alias("price_band"),
        (-F.col("o_custkey")).alias("neg_cust"),
        F.col("o_orderkey").cast("string").alias("key_str"),
    )


@_register(
    "q_substr_concat_extract",
    """
    SELECT n_name,
           SUBSTRING(n_name, 1, 3) AS name_pfx,
           n_name || '-' || CAST(n_regionkey AS VARCHAR) AS name_region,
           UPPER(n_name) AS name_up,
           LENGTH(n_name) AS name_len
    FROM nation
    """,
)
def q_substr_concat_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTR + CONCAT — the reference's only two scalar functions
    (function_expression.hpp:8-11) — plus upper/length which Spark adds."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.substring("n_name", 1, 3).alias("name_pfx"),
        F.concat_ws("-", F.col("n_name"), F.col("n_regionkey").cast("string")).alias("name_region"),
        F.upper("n_name").alias("name_up"),
        F.length("n_name").alias("name_len"),
    )


@_register(
    "q_extract_date",
    """
    SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)
    """,
)
def q_extract_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT(year/month) — the reference implements this as fixed-offset
    substring on date strings (expression_evaluator.cpp:798-807); Spark has
    real timestamp types."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("o_totalprice"), "total"))


# ---------------------------------------------------------------------------
# Joins (reference: JoinHash/JoinSortMerge/JoinNestedLoop/Product,
# modes at src/lib/types.hpp:207-212)
# ---------------------------------------------------------------------------

@_register(
    "q3_top_orders",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way inner join + agg + top-k. customer is broadcast
    (dim), orders⋈lineitem shuffles on the key. Sort+Limit fuses to
    TakeOrderedAndProject (reference composes Sort+Limit, SURVEY §2.6)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@_register(
    "q5_local_suppliers",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a multi-predicate join
    (c_nationkey = s_nationkey secondary predicate — reference:
    multi_predicate_join_evaluator.hpp). Dims broadcast; Catalyst+AQE order
    the rest."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@_register(
    "q_join_left_outer",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS spend
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with a join-side residual predicate (reference join
    modes types.hpp:207-212; COUNT over the null-extended side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey.alias("c_custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), F.lit(0.0)).alias("spend"),
        )
    )


@_register(
    "q_join_full_outer",
    """
    WITH hi_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         big_ord AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders
                     WHERE o_totalprice > 90000 GROUP BY o_custkey)
    SELECT COALESCE(h.c_custkey, b.o_custkey) AS custkey,
           h.c_acctbal AS acctbal, b.n_big AS n_big
    FROM hi_cust h FULL OUTER JOIN big_ord b ON h.c_custkey = b.o_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one mode the reference's JoinHash cannot do,
    join_hash.cpp:26-32 — it falls back to sort-merge; Spark SMJ likewise)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    hi = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    big = (
        o.filter(F.col("o_totalprice") > 90000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return hi.join(big, hi.c_custkey == big.o_custkey, "full_outer").select(
        F.coalesce(hi.c_custkey, big.o_custkey).alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("n_big").alias("n_big"),
    )


@_register(
    "q_join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 100000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (reference: JoinMode::Semi, ExistenceOnly build mode in
    join_hash_steps.hpp:32; produced by SubqueryToJoinRule). Spark:
    left_semi."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@_register(
    "q_join_anti",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND EXTRACT(YEAR FROM o_orderdate) = 1995)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join, NOT EXISTS flavor (reference: JoinMode::AntiNullAsFalse).
    Spark: left_anti. ("no 1995 order" keeps the result non-empty at every
    scale factor, unlike "no order at all".)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@_register(
    "q_not_in_null_aware",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    """,
)
def q_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — null-aware anti join (reference:
    JoinMode::AntiNullAsTrue). Expressed in SQL so Catalyst's
    RewritePredicateSubquery produces the null-aware anti join."""
    from ..sources.tables import load_tables

    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        """
    )


@_register(
    "q_cross_product",
    """
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def q_cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (reference: Product operator, product.hpp:13-18)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(F.col("r_name"), F.col("n_name"))


@_register(
    "q_theta_join",
    """
    SELECT p.p_partkey, COUNT(*) AS n_cheaper
    FROM part p JOIN part q
      ON p.p_size = q.p_size AND q.p_retailprice < p.p_retailprice
    GROUP BY p.p_partkey
    """,
)
def q_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) self join: one equi key + inequality residual —
    the shape the reference routes to JoinSortMerge (join_sort_merge.cpp:30);
    Spark runs SMJ/BHJ with the residual filter."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    q = p.select(
        F.col("p_partkey").alias("q_partkey"),
        F.col("p_size").alias("q_size"),
        F.col("p_retailprice").alias("q_price"),
    )
    return (
        p.join(q, (p.p_size == q.q_size) & (q.q_price < p.p_retailprice))
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_cheaper"))
    )


@_register(
    "q_scalar_subquery",
    """
    SELECT p_partkey, p_retailprice FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (reference caches these once per query,
    expression_evaluator.hpp:52-57; Catalyst evaluates as a subquery expr).

    AVG comparison is threshold-only (not projected) so native double avg
    is safe cross-engine here: both engines agree on all but a measure-zero
    boundary set, and p_retailprice values are 2-decimal."""
    from ..sources.tables import load_tables

    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return spark.sql(
        "SELECT p_partkey, p_retailprice FROM part "
        "WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)"
    )


# ---------------------------------------------------------------------------
# Sort / limit (reference: Sort, src/lib/operators/sort.cpp — stable,
# NULLS FIRST in both directions, types.hpp:219-221)
# ---------------------------------------------------------------------------

@_register(
    "q_sort_multi_nulls_first",
    """
    SELECT event_id, event_type, value FROM events
    ORDER BY value ASC NULLS FIRST, event_type DESC NULLS FIRST, event_id
    LIMIT 50
    """,
)
def q_sort_multi_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with the reference's NULLS-FIRST-always semantics
    (types.hpp:219-221) — Spark needs explicit *_nulls_first on DESC.
    event_id tiebreak makes the LIMIT deterministic."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", "event_type", "value")
        .orderBy(
            F.asc_nulls_first("value"),
            F.desc_nulls_first("event_type"),
            F.asc("event_id"),
        )
        .limit(50)
    )


@_register(
    "q_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort+Limit -> TakeOrderedAndProject (no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set operations (reference: UnionAll, Difference; INTERSECT/EXCEPT planned
# but unimplemented — lqp_translator.cpp:467-476. Spark has them all.)
# ---------------------------------------------------------------------------

@_register(
    "q_union_all",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_acctbal > 9500
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier WHERE s_acctbal > 9500
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"))
        .unionAll(
            s.filter(F.col("s_acctbal") > 9500).select(
                F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
            )
        )
    )


@_register(
    "q_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(s.filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("nationkey")))
    )


@_register(
    "q_except",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9700
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9700
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (reference Difference operator, difference.hpp:14-16, not even
    reachable from its SQL — built-in here)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.filter(F.col("c_acctbal") > 9700)
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(s.filter(F.col("s_acctbal") > 9700).select(F.col("s_nationkey").alias("nationkey")))
    )


# ---------------------------------------------------------------------------
# Window functions (absent from the reference, SURVEY §2.5; Spark built-in)
# ---------------------------------------------------------------------------

@_register(
    "q_window_topk_per_group",
    """
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
    WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the pattern the dedup pipeline uses
    to pick canonical cluster representatives."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@_register(
    "q_window_running",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event
    FROM events WHERE user_id < 50
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag with an explicit ROWS frame. Decimal accumulation
    keeps the running sum bit-identical cross-engine."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.filter(F.col("user_id") < 50).select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.lag("event_id").over(w).alias("prev_event"),
    )
