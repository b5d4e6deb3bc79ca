"""Third tranche of relational coverage — the remaining TPC-H query shapes
the reference benchmark suite runs (reference: all 22 queries in
src/benchmarklib/tpch/tpch_queries.cpp:809-882; validation set
resources/tpch_validation_queries.sql).

The driver testdata is a REDUCED TPC-H (no partsupp table; lineitem has no
commit/receipt dates; customer has no phone), so each query here keeps the
reference query's OPERATOR shape — the joins, subquery patterns, pivots and
date arithmetic that exercise distinct engine capabilities — re-based onto
the available columns. Cross-engine float determinism follows the
decimal-cast convention (see relational.py).

New operator content vs tranches 1-2:
- INTERVAL literals / in-engine date arithmetic (q4, q21 — reference:
  src/lib/expression/interval_expression.hpp; previously all date bounds
  were pre-computed literals)
- double correlated EXISTS + NOT EXISTS self-join (q21)
- substring bucketing + AVG-subquery + NOT EXISTS (q22)
- CTE/view + scalar-max subquery (q15 — the reference rewrites a view per
  run, tpch_benchmark_item_runner.cpp:342-349)
- correlated aggregate subquery against the outer row (q17, q2)
- left-join count distribution (q13), year-pivot multi-joins (q7/q8/q9),
  HAVING vs scalar subquery (q11), nested agg + IN chain (q20),
  RIGHT OUTER join (the one JoinMode with no prior gate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table, load_tables
from .relational import _dsum, _register


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return spark.sql(text)


@_register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-07-01' + INTERVAL 3 MONTH
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-agg with IN-ENGINE interval arithmetic on
    both the range bound and the correlated predicate (reference:
    interval_expression.hpp; 'commit<receipt' becomes 'shipped >60 days
    after order' on the reduced schema).

    r6 plan rewrite (results identical, oracle unchanged): the SQL EXISTS
    planned as a LeftSemi join that can only build its RIGHT side, so the
    whole lineitem table was shuffled against the ~4%-selective filtered
    orders. Restated as broadcast(filtered orders) INNER join lineitem +
    distinct-on-orderkey: lineitem never shuffles (map-side broadcast
    probe), only the matched (o_orderkey, o_orderpriority) pairs cross
    one exchange."""
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-07-01").cast("timestamp_ntz")
    orders_f = t["orders"].filter(
        (F.col("o_orderdate") >= lo)
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ'1996-07-01' + INTERVAL '3' MONTH"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    hits = (
        t["lineitem"]
        .select("l_orderkey", "l_shipdate")
        .join(F.broadcast(orders_f), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL '60' DAY"))
        .select("o_orderkey", "o_orderpriority")
        .distinct()
    )
    return hits.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@_register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
         ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair disjunction over a 6-way join + year
    pivot. Both nation copies broadcast; the OR predicate stays one filter
    (reference would split via PredicateSplitUpRule + UnionPositions)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(t["orders"], li.l_orderkey == t["orders"].o_orderkey)
        .join(t["customer"], F.col("o_custkey") == t["customer"].c_custkey)
        .join(F.broadcast(t["supplier"]), li.l_suppkey == t["supplier"].s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))


@_register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                         AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n
    FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation n1 ON c_nationkey = n1.n_nationkey
               JOIN region ON n1.n_regionkey = r_regionkey
               JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join + CASE-pivot market-share ratio per
    year (conditional sum / total sum in exact decimal)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_year,
               CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                             AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n
        FROM (SELECT YEAR(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part JOIN lineitem ON p_partkey = l_partkey
                   JOIN supplier ON s_suppkey = l_suppkey
                   JOIN orders ON l_orderkey = o_orderkey
                   JOIN customer ON o_custkey = c_custkey
                   JOIN nation n1 ON c_nationkey = n1.n_nationkey
                   JOIN region ON n1.n_regionkey = r_regionkey
                   JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') all_nations
        GROUP BY o_year
        """,
    )


@_register(
    "q9_product_profit",
    """
    SELECT nation, o_year, CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
          FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%' OR p_name LIKE '%green%') profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part join + profit expression pivoted
    by nation x year (supply cost proxied by 0.1*retailprice — no partsupp
    in the reduced schema)."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%") | F.col("p_name").like("%green%"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(F.broadcast(p), t["lineitem"].l_partkey == p.p_partkey)
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(F.broadcast(t["supplier"]), t["lineitem"].l_suppkey == t["supplier"].s_suppkey)
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == t["nation"].n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(amount, "sum_profit"))
    )


@_register(
    "q11_important_parts",
    """
    SELECT l_partkey AS ps_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS part_value
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 0
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(38,6))) >
           (SELECT SUM(CAST(l_extendedprice AS DECIMAL(38,6))) * 0.001
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
            WHERE n_regionkey = 0)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING compared against an uncorrelated scalar
    subquery over the same join (fraction-of-total filter). The exact
    decimal comparison is engine-order-independent."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT l_partkey AS ps_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS part_value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 0
        GROUP BY l_partkey
        HAVING SUM(CAST(l_extendedprice AS DECIMAL(38,6))) >
               (SELECT SUM(CAST(l_extendedprice AS DECIMAL(38,6))) * 0.001
                FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                     JOIN nation ON s_nationkey = n_nationkey
                WHERE n_regionkey = 0)
        """,
    )


@_register(
    "q13_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join with a join-side residual, COUNT
    over the null-extended side, then a distribution over the counts
    (aggregate of an aggregate)."""
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: CTE (the reference rewrites a CREATE VIEW per run,
    tpch_benchmark_item_runner.cpp:342-349) reused twice — once joined,
    once under a scalar MAX subquery. Exact decimal revenue makes the
    MAX-equality cross-engine stable."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
                   AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP_NTZ'1996-01-01'
            AND l_shipdate < TIMESTAMP_NTZ'1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        """,
    )


@_register(
    "q17_small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                                      / COUNT(*))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery (per-part average
    quantity) gating the outer scan. The average is derived from the exact
    decimal sum so the threshold is bit-identical cross-engine."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                                          / COUNT(*))
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """,
    )


@_register(
    "q20_promotion_suppliers",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%gear%'
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 50)
      AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a nested grouped-HAVING subquery, chained
    with a second IN (semi-join chain after decorrelation)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%gear%'
              AND l_shipdate >= TIMESTAMP_NTZ'1997-01-01'
              AND l_shipdate < TIMESTAMP_NTZ'1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 50)
          AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
        """,
    )


@_register(
    "q21_waiting_suppliers",
    """
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_name, COUNT(*) AS numwait
    FROM flagged l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE l1.late = 1
      AND n_regionkey = 1
      AND EXISTS (SELECT 1 FROM flagged l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double correlated EXISTS + NOT EXISTS self-join on
    the (flagged) lineitem — the only supplier late on a multi-supplier
    order. 'Late' = shipped >90 days after order date (in-engine interval
    arithmetic), replacing receipt>commit on the reduced schema.

    r6 plan rewrite (results identical, oracle unchanged): Spark inlines
    the ``flagged`` CTE at all three references, so the SQL form paid the
    lineitem-orders join THREE times plus two self-join shuffles. The
    per-order facts the EXISTS pair actually tests are "some other
    supplier on the order" and "no other LATE supplier", i.e. distinct
    supplier counts — computed here with window aggregates over
    l_orderkey that reuse the join's own output partitioning: ONE
    lineitem-orders shuffle total, zero self-joins."""
    t = load_tables(spark, sf_dir)
    flagged = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t["orders"]
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.expr("o_orderdate + INTERVAL '90' DAY")
            ).cast("int").alias("late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    per_row = flagged.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("late") == 1, F.col("l_suppkey"))
            ).over(w)
        ).alias("n_late_supp"),
    )
    qualifying = per_row.filter(
        (F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    supp = t["supplier"].join(
        F.broadcast(t["nation"].filter(F.col("n_regionkey") == 1)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        qualifying.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_register(
    "q22_cntrycode",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM (SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
          FROM customer
          WHERE SUBSTRING(c_name, 17, 2) IN ('01','02','13','17','18','23','29')) active
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
                       FROM customer
                       WHERE c_acctbal > 0.0
                         AND SUBSTRING(c_name, 17, 2) IN ('01','02','13','17','18','23','29'))
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    """,
)
def q22_cntrycode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: substring bucketing (phone country code becomes
    the customer-number suffix on the reduced schema) + uncorrelated AVG
    subquery threshold + NOT EXISTS anti join. The average is exact-sum
    derived for a cross-engine-stable threshold."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
        FROM (SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
              FROM customer
              WHERE SUBSTRING(c_name, 17, 2) IN ('01','02','13','17','18','23','29')) active
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer
                           WHERE c_acctbal > 0.0
                             AND SUBSTRING(c_name, 17, 2) IN
                                 ('01','02','13','17','18','23','29'))
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
        GROUP BY cntrycode
        """,
    )


@_register(
    "q2_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
    FROM part JOIN supply ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= 15 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
      AND unit_cost = (SELECT MIN(s2.unit_cost) FROM supply s2
                       JOIN supplier sup2 ON sup2.s_suppkey = s2.l_suppkey
                       JOIN nation n2 ON sup2.s_nationkey = n2.n_nationkey
                       JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                       WHERE s2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery over the same multi-dim
    join as the outer query + 4-key sort + limit (partsupp is synthesized
    from lineitem unit prices; MIN over doubles is exact, so the equality
    is cross-engine stable)."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH supply AS (
          SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
        FROM part JOIN supply ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
        WHERE p_size <= 15 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
          AND unit_cost = (SELECT MIN(s2.unit_cost) FROM supply s2
                           JOIN supplier sup2 ON sup2.s_suppkey = s2.l_suppkey
                           JOIN nation n2 ON sup2.s_nationkey = n2.n_nationkey
                           JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                           WHERE s2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """,
    )


@_register(
    "q_join_right_outer",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join with a join-side residual (reference:
    JoinMode::Right, src/lib/types.hpp:207-212 — previously mapped in
    operators/core.py but never exercised by a gate)."""
    t = load_tables(spark, sf_dir)
    o, c = t["orders"], t["customer"]
    return o.join(
        c, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 150000), "right"
    ).select(c.c_custkey.alias("c_custkey"), "o_orderkey", "o_totalprice")
