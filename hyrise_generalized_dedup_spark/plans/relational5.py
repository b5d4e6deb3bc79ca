"""Fifth tranche: Join Order Benchmark (JOB)-shaped query coverage.

The reference ships the Join Order Benchmark as a first-class suite
(reference: README.md:52-61, src/benchmark/file_based_benchmark.cpp with
resources/benchmark/join_order_benchmark; the suite is Leis et al.'s
"How Good Are Query Optimizers, Really?", VLDB 2015). JOB's signature
shapes — absent from TPC-H/DS — are: MIN()-only aggregates over many-way
joins, the same dimension joined twice under different aliases with
different filters, long join chains whose ordering dominates cost, and
disjunctive LIKE filters that defeat naive selectivity estimates. Each
shape is re-based onto the reduced driver schema with the join topology
preserved, expressed via the DataFrame API so Catalyst (with AQE) picks
the join order, and hash-exact gated against a DuckDB oracle in the full
registry (driver slots stay capped at 50).

Float determinism follows the decimal-cast convention (relational.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .relational import _dsum, _register


@_register(
    "qjob_min_over_joins",
    """
    SELECT MIN(c.c_name) AS first_customer,
           MIN(o.o_orderdate) AS first_order,
           MIN(p.p_name) AS first_part
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE n.n_name LIKE 'A%'
      AND p.p_type LIKE '%BRASS'
      AND o.o_orderpriority = '1-URGENT'
    """,
)
def qjob_min_over_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB 1a shape: a MIN()-only aggregate over a 5-way join with LIKE
    filters on two dimensions — the answer is tiny but every join order
    choice is visible in the plan. Catalyst + AQE pick the order; the
    dimension filters are pushed below the joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").like("A%"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("%BRASS"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.min("c_name").alias("first_customer"),
            F.min("o_orderdate").alias("first_order"),
            F.min("p_name").alias("first_part"),
        )
    )


@_register(
    "qjob_dim_twice_aliased",
    """
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE n1.n_name LIKE '%A%' AND n2.n_name LIKE '%N%'
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
    """,
)
def qjob_dim_twice_aliased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB's aliased-dimension shape (e.g. info_type AS it1/it2): the SAME
    dimension table enters the join twice under different aliases with
    different filters, plus an inequality between the two instances —
    a self-join disambiguation exercise for the planner."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.filter(F.col("n_name").like("%A%")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.filter(F.col("n_name").like("%N%")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .filter(F.col("n1_key") != F.col("n2_key"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _dsum(F.col("l_extendedprice"), "volume"),
        )
    )


@_register(
    "qjob_chain_region_to_part",
    """
    SELECT r.r_name, MIN(p.p_name) AS first_part, COUNT(*) AS n_lines
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE o.o_orderstatus = 'F' AND p.p_type LIKE 'SMALL%'
    GROUP BY r.r_name
    """,
)
def qjob_chain_region_to_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB's long-chain shape: a 6-table chain region -> nation ->
    supplier -> lineitem -> orders -> part where a greedy left-deep
    order that starts from region (1-row-ish) is right and starting from
    lineitem is catastrophically wrong — exactly the ordering decision
    the benchmark was built to probe. Declared flat; AQE reorders."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("SMALL%"))
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(s, s.s_nationkey == n.n_nationkey)
        .join(li, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("r_name")
        .agg(F.min("p_name").alias("first_part"), F.count(F.lit(1)).alias("n_lines"))
    )


@_register(
    "qjob_disjunctive_likes",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           MIN(p_retailprice) AS min_price,
           MAX(p_retailprice) AS max_price
    FROM part
    WHERE (p_type LIKE 'SMALL%' OR p_type LIKE '%COPPER' OR p_name LIKE '%olive%')
      AND p_size BETWEEN 10 AND 40
      AND p_brand NOT LIKE 'Brand#5%'
    """,
)
def qjob_disjunctive_likes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB's disjunctive-LIKE filter shape: OR across LIKE patterns on
    two columns plus a NOT LIKE — the selectivity-estimation stress case.
    Stays a single scan with the whole predicate pushed to it."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        (
            F.col("p_type").like("SMALL%")
            | F.col("p_type").like("%COPPER")
            | F.col("p_name").like("%olive%")
        )
        & F.col("p_size").between(10, 40)
        & ~F.col("p_brand").like("Brand#5%")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
    )


@_register(
    "qjob_fact_two_branches",
    """
    WITH urgent AS (
      SELECT o_custkey, COUNT(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    ),
    low AS (
      SELECT o_custkey, COUNT(*) AS n_low
      FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(u.n_urgent) AS BIGINT) AS total_urgent,
           CAST(SUM(lw.n_low) AS BIGINT) AS total_low
    FROM customer c
    JOIN urgent u ON u.o_custkey = c.c_custkey
    JOIN low lw ON lw.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def qjob_fact_two_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB's fact-joined-twice shape (movie_info x2 under different
    filters): the same fact table aggregated under two different
    predicates, both branches joined back to the entity — customers that
    have BOTH urgent and low-priority orders, by segment."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
        .withColumnRenamed("o_custkey", "u_custkey")
    )
    low = (
        orders.filter(F.col("o_orderpriority") == "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_low"))
        .withColumnRenamed("o_custkey", "l_custkey")
    )
    return (
        cust.join(urgent, cust.c_custkey == F.col("u_custkey"))
        .join(low, cust.c_custkey == F.col("l_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("n_urgent").cast("bigint").alias("total_urgent"),
            F.sum("n_low").cast("bigint").alias("total_low"),
        )
    )


@_register(
    "qjob_min_strings_over_chain",
    """
    SELECT MIN(c_name) AS min_cust, MIN(s_name) AS min_supp,
           MIN(n_name) AS min_nation, COUNT(*) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name LIKE 'A%' AND o_orderstatus = 'F' AND l_quantity > 45
    """,
)
def qjob_min_strings_over_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB's hallmark output shape — MIN() over VARCHAR columns after a
    many-way join chain (every JOB query SELECTs MIN(title), MIN(name),
    ...). Five-way chain with a selective dim LIKE and a fact range;
    Catalyst+AQE pick the order, the dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").like("A%"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
    )
    return j.agg(
        F.min("c_name").alias("min_cust"),
        F.min("s_name").alias("min_supp"),
        F.min("n_name").alias("min_nation"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "qjob_anti_dim_filter",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey NOT IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_quantity > 49 AND EXTRACT(YEAR FROM l_shipdate) = 2000
        AND l_suppkey IS NOT NULL)
    ORDER BY s_suppkey
    """,
)
def qjob_anti_dim_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB-style negative-evidence query (entities with NO qualifying
    fact rows): suppliers that shipped no max-quantity line in 2000 —
    an anti join against the filtered fact, broadcast when the filtered
    side is small. (Predicate chosen non-vacuous at sf0.001 AND sf0.01:
    1/10 and 11/100 suppliers qualify.)"""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 49)
        & (F.year("l_shipdate") == 2000)
        & F.col("l_suppkey").isNotNull()
    )
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey, "left_anti")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@_register(
    "qjob_count_distinct_dims",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT c_nationkey) AS n_cust_nations,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def qjob_count_distinct_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB-style distinct-entity counting across a join (how many
    distinct companies/keywords per category): two COUNT(DISTINCT)s with
    different key domains in one aggregate — Spark expands to a
    multi-distinct aggregate without a self-join."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("c_nationkey").alias("n_cust_nations"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


@_register(
    "qjob_two_fact_aliases",
    """
    SELECT a.l_orderkey,
           COUNT(*) AS n_pairs,
           CAST(MIN(a.l_quantity) AS DOUBLE) AS min_ret_qty,
           CAST(MAX(b.l_quantity) AS DOUBLE) AS max_kept_qty
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    WHERE a.l_returnflag = 'R' AND b.l_returnflag = 'N'
    GROUP BY a.l_orderkey
    ORDER BY a.l_orderkey
    LIMIT 100
    """,
)
def qjob_two_fact_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOB's same-table-twice shape on the FACT side (movie_info a,
    movie_info b with different filters, joined on the entity): returned
    and kept lines of the same order paired with a line-number
    inequality — an equi join on the order key with a residual range
    predicate, NOT a cartesian per order."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").alias("a")
    b = li.filter(F.col("l_returnflag") == "N").alias("b")
    j = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    )
    return (
        j.groupBy(F.col("a.l_orderkey").alias("l_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("a.l_quantity").cast("double").alias("min_ret_qty"),
            F.max("b.l_quantity").cast("double").alias("max_kept_qty"),
        )
        .orderBy("l_orderkey")
        .limit(100)
    )
