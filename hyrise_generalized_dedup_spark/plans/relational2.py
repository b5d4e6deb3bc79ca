"""Second tranche of relational coverage — the harder TPC-H shapes:
correlated subqueries, HAVING over aggregates, conditional aggregation,
disjunctive multi-column predicates, grouped distinct counts. All with
exact DuckDB oracles (decimal-cast convention, see relational.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..goldens import golden_oracle
from ..sources.tables import load_tables
from .relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES, _dsum, _register


def _views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


@_register(
    "q_correlated_min",
    """
    SELECT p.p_partkey, p.p_brand, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (SELECT MIN(q.p_retailprice) FROM part q
                             WHERE q.p_brand = p.p_brand)
    """,
)
def q_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery (cheapest part per
    brand). Catalyst decorrelates to an aggregate + join — the rewrite the
    reference implements in SubqueryToJoinRule (subquery_to_join_rule.cpp)."""
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand, p.p_retailprice
        FROM part p
        WHERE p.p_retailprice = (SELECT MIN(q.p_retailprice) FROM part q
                                 WHERE q.p_brand = p.p_brand)
        """
    )


@_register(
    "q_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 20
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (reference: HAVING handled in the translator's
    SELECT pipeline, sql_translator.cpp:224-318)."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), _dsum(F.col("o_totalprice"), "spend"))
        .filter(F.col("n_orders") >= 20)
    )


@_register(
    "q14_conditional_agg",
    """
    SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                         AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
           AS promo_revenue_pct,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q14_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a join (CASE inside
    SUM)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(t["part"]), li.l_partkey == t["part"].p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0).cast("decimal(38,6)")).cast("double")
            / F.sum(rev.cast("decimal(38,6)")).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "q19_disjunctive",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-way disjunction of conjunctive range
    predicates over a join (reference: PredicateSplitUpRule +
    UnionPositions; Catalyst keeps it one predicate)."""
    t = load_tables(spark, sf_dir)
    li, p = t["lineitem"], t["part"]
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(cond).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "q18_large_orders",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_custkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join + group + HAVING on the aggregate."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q_dec"))
        .filter(F.col("q_dec") > 150)
        .select("o_orderkey", "o_custkey", F.col("q_dec").cast("double").alias("total_qty"))
    )


@_register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 7, 10, 13)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: grouped COUNT(DISTINCT) with <> and IN filters."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 4, 7, 10, 13)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), t["lineitem"].l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "q_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction (get_json_object) — absent
    from the reference's type system (SURVEY §1.2: no JSON type); native
    in Spark."""
    e = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k.cast("long")).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@_register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join + group + top-20 by revenue."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(t["customer"], o.o_custkey == t["customer"].c_custkey)
        .join(F.broadcast(t["nation"]), t["customer"].c_nationkey == t["nation"].n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_register(
    "q12_shipmode",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS closed_count,
           CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS open_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
      AND l_linenumber <= 2
    GROUP BY o_orderpriority
    """,
)
def q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-pivot counts per priority."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        & (F.col("l_linenumber") <= 2)
    )
    return (
        t["orders"]
        .join(li, t["orders"].o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("closed_count"),
            F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).alias("open_count"),
        )
    )


@_register(
    "q_approx_distinct",
    # HLL++/GK sketches are engine-specific (DuckDB can't recompute them),
    # but both estimates are DETERMINISTIC for a fixed input regardless of
    # partitioning — HLL registers merge by max and GK quantile merge is
    # order-stable here (probed bit-stable at local[4]/4 vs local[32]/32 by
    # scripts/probe_golden_determinism.py) — so a committed golden
    # value-checks the slot. Accuracy vs exact stays gated in pytest.
    golden_oracle(
        "q_approx_distinct", ["event_type", "approx_users", "p50_value", "n"]
    ),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (approx_count_distinct + percentile_approx) —
    the reference has NO approximate distinct (SURVEY §2.4: exact
    robin_set only); Spark's HLL++ is the 10^12-row answer. Accuracy vs
    exact is gated in pytest (within 5%)."""
    e = load_tables(spark, sf_dir)["events"]
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 1000).alias("p50_value"),
        F.count(F.lit(1)).alias("n"),
    )
