"""Exact-integer PageRank over a relational entity graph.

Graph analytics inside the engine (the Spark GraphFrames / Trino-graph
territory): entity-importance ranking is a standard corpus-curation
signal (weight sources by the centrality of what references them). The
reference repo has no graph operator; this module adds the second
iterative capability class alongside the trained classifier
(functions/classifier.py) — and, unlike most PageRank implementations,
this one is EXACTLY replayable by a SQL engine, so the driver slot is
oracle-backed (hash-exact), not golden-backed:

- **Graph**: the customer <-> supplier bipartite interaction graph from
  ``lineitem JOIN orders`` (customer c bought an item supplied by s),
  one undirected edge per DISTINCT (c, s) pair, encoded as two directed
  edges over disjoint node ids (customers even ``2c``, suppliers odd
  ``2s+1``).
- **Recurrence (all int64, no floats anywhere)**: with total mass
  ``M = 10^12`` over ``N`` nodes, ``B = (15·(M div N)) div 100``,

      r_0[n]    = M div N
      share_t[n] = r_t[n] div deg[n]
      inflow_t[n] = Σ_{(m -> n) in E} share_t[m]
      r_{t+1}[n] = B + (85·inflow_t[n]) div 100

  for a fixed ``ITERS`` steps. Integer division and BIGINT sums are
  bit-identical in Spark and DuckDB, and integer addition is order-free,
  so the whole trajectory is exact — the DuckDB oracle replays it as a
  programmatically generated chain of per-iteration CTEs. (The damping
  floor-division deliberately does NOT conserve mass exactly; the
  recurrence is the spec, not an approximation of float PageRank — it
  converges to the same ordering at these damping terms.)

Scale story (100 TB lens): edges are built from one distinct-pair
aggregation (partial-agg groupBy over int pairs); the rank table is
node-bounded, so each iteration is one broadcast join of ranks against
the edge list plus one map-side-combined groupBy sum — ranks broadcast
while nodes fit (size-gated; at 10^12 nodes the joins fall back to an
AQE-planned shuffle hash join keyed on node id, the standard Pregel
layout). Iteration count is fixed and small. Per-iteration traffic is
O(edges) int64 rows; content never enters the operator.

Verification: the driver slot ``graph_pagerank_entities`` (folded into
g_ann_dedup) hash-checks every node's rank vs the DuckDB CTE replay at
sf0.01; pytest adds a from-scratch Python twin on a toy graph, a
repartition-invariance probe, and semantic checks (higher-degree hubs
outrank leaves; disconnected ids absent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Total fixed-point mass and damping terms of the recurrence.
TOTAL_MASS = 1_000_000_000_000  # 10^12: r0 ~ 6e8 at sf0.01's ~1.6k nodes
DAMP_NUM, DAMP_DEN = 85, 100
BASE_NUM = 15
ITERS = 8

# Below this node count the per-iteration rank table is broadcast
# (N * ~24 bytes; 5M nodes ~ 120 MB, the repo's usual broadcast budget
# scale); above it the joins shuffle on node id under AQE.
BROADCAST_MAX_NODES = 5_000_000


def entity_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Directed edge list of the undirected customer<->supplier graph:
    ``(src, dst)`` with customers encoded ``2c`` and suppliers ``2s+1``."""
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    rev = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    return fwd.unionByName(rev)


def pagerank(edges: DataFrame, iters: int = ITERS) -> DataFrame:
    """Run the exact-integer recurrence; returns ``(node, degree, rank)``
    BIGINTs for every node with at least one outgoing edge."""
    spark = edges.sparkSession
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("src").alias("node"), "d"
    )
    deg = deg.persist()
    n_nodes = deg.count()
    if n_nodes == 0:
        return spark.createDataFrame(
            [], "node LONG, degree LONG, rank LONG"
        )
    r0 = TOTAL_MASS // n_nodes
    base = (BASE_NUM * r0) // DAMP_DEN
    maybe_b = F.broadcast if n_nodes <= BROADCAST_MAX_NODES else (lambda df: df)

    ranks = deg.select("node", "d", F.lit(r0).cast("long").alias("r"))
    for _ in range(iters):
        shares = ranks.select(
            "node", F.expr("r div d").cast("long").alias("share")
        )
        inflow = (
            edges.join(maybe_b(shares), edges["src"] == shares["node"])
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            deg.join(
                maybe_b(inflow), deg["node"] == inflow["dst"], "left"
            )
            .select(
                "node",
                "d",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(inflow, 0L)) div {DAMP_DEN}"
                    )
                ).cast("long").alias("r"),
            )
        )
    out = ranks.select(
        "node", F.col("d").cast("long").alias("degree"), F.col("r").alias("rank")
    )
    return out


def pagerank_entities(spark: SparkSession, lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Driver-gate surface: decode node ids back to entity keys."""
    pr = pagerank(entity_edges(lineitem, orders))
    return pr.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_kind"),
        F.expr("node div 2").cast("long").alias("entity_id"),
        "degree",
        "rank",
    )


def pagerank_oracle_sql(iters: int = ITERS) -> str:
    """DuckDB twin: the same recurrence as a generated CTE chain. SUMs
    are cast back to BIGINT (DuckDB sums BIGINT into HUGEINT); integer
    division ``//`` matches Spark's ``div`` on non-negative operands."""
    parts = [
        """pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS cnode, l.l_suppkey * 2 + 1 AS snode
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )""",
        """edges AS (
      SELECT cnode AS src, snode AS dst FROM pairs
      UNION ALL
      SELECT snode AS src, cnode AS dst FROM pairs
    )""",
        """deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
    )""",
        f"""consts AS (
      SELECT CAST({TOTAL_MASS} // COUNT(*) AS BIGINT) AS r0,
             CAST(({BASE_NUM} * ({TOTAL_MASS} // COUNT(*))) // {DAMP_DEN}
                  AS BIGINT) AS base
      FROM deg
    )""",
        "r0 AS (SELECT node, d, (SELECT r0 FROM consts) AS r FROM deg)",
    ]
    for t in range(iters):
        parts.append(
            f"""c{t} AS (
      SELECT e.dst AS node, CAST(SUM(r{t}.r // r{t}.d) AS BIGINT) AS inflow
      FROM edges e JOIN r{t} ON e.src = r{t}.node GROUP BY e.dst
    )"""
        )
        parts.append(
            f"""r{t + 1} AS (
      SELECT deg.node, deg.d,
             CAST((SELECT base FROM consts)
                  + ({DAMP_NUM} * COALESCE(c{t}.inflow, 0)) // {DAMP_DEN}
                  AS BIGINT) AS r
      FROM deg LEFT JOIN c{t} ON deg.node = c{t}.node
    )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_kind,
           CAST(node // 2 AS BIGINT) AS entity_id,
           d AS degree, r AS rank
    FROM r{iters}"""
    )


# --- exact triangle census ----------------------------------------------
#
# Clique-density analytics over entity / similarity graphs (the
# transitivity check for dedup cluster QA: near-dup graphs whose
# components are triangle-dense are clique-like; sparse components are
# chains worth re-verifying). Degree-orientation algorithm (Suri &
# Vassilvitskii 2011; Cohen 2009 — the standard distributed pattern):
# orient every undirected edge from its (degree, id)-smaller endpoint to
# the larger, bounding every out-neighborhood by O(sqrt(2m)); wedges are
# a self-join of the oriented list on source, and a wedge (b, c) closes
# iff the oriented edge b -> c exists. All joins are equi-joins under
# AQE; the census is exact integers, so the driver slot is LIVE-oracled
# (the DuckDB twin counts the same triangles by id-order 3-way join —
# a different orientation of the SAME triangle set).


def triangle_census(edges: DataFrame) -> DataFrame:
    """Per-node exact triangle counts over an undirected simple graph.

    ``edges``: two columns ``u, v`` (bigint); rows are deduplicated and
    canonicalized internally, self-loops dropped. Returns
    ``(node, n_triangles)`` for every node in at least one triangle.
    """
    e = (
        edges.selectExpr("least(u, v) AS u", "greatest(u, v) AS v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.selectExpr("u AS node")
        .unionAll(e.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # orient by (degree, id): src = smaller endpoint under that order
    keyed = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
        .selectExpr(
            "CASE WHEN struct(du, u) < struct(dv, v) THEN u ELSE v END AS src",
            "CASE WHEN struct(du, u) < struct(dv, v) THEN v ELSE u END AS dst",
            "CASE WHEN struct(du, u) < struct(dv, v) THEN du ELSE dv END AS dsrc",
            "CASE WHEN struct(du, u) < struct(dv, v) THEN dv ELSE du END AS ddst",
        )
    )
    oriented = keyed.select("src", "dst", "dsrc", "ddst")
    # wedges centered at src: unordered out-neighbor pairs (b, c) with
    # (deg, id)-order b < c, so each wedge appears exactly once
    left = oriented.selectExpr("src AS a", "dst AS b", "ddst AS db")
    right = oriented.selectExpr("src AS a", "dst AS c", "ddst AS dc")
    wedges = left.join(right, "a").filter(
        F.expr("struct(db, b) < struct(dc, c)")
    )
    closing = oriented.selectExpr("src AS b", "dst AS c")
    triangles = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    return (
        triangles.selectExpr("a AS node")
        .unionAll(triangles.selectExpr("b AS node"))
        .unionAll(triangles.selectExpr("c AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def codate_customer_edges(orders: DataFrame, max_custkey: int = 600) -> DataFrame:
    """Deterministic demo graph for the census: customers (key below
    ``max_custkey``) who ordered on the same date. Bounded at any scale
    factor by C(max_custkey, 2) edges."""
    co = (
        orders.filter(F.col("o_custkey") < max_custkey)
        .select("o_custkey", "o_orderdate")
        .distinct()
    )
    a = co.selectExpr("o_custkey AS u", "o_orderdate AS d")
    b = co.selectExpr("o_custkey AS v", "o_orderdate AS d")
    return a.join(b, "d").filter(F.col("u") < F.col("v")).select("u", "v").distinct()


def triangle_oracle_sql(max_custkey: int = 600) -> str:
    """DuckDB twin: same graph, triangles via the id-order 3-way join."""
    return f"""
WITH co AS (
  SELECT DISTINCT o_custkey, o_orderdate FROM orders
  WHERE o_custkey < {max_custkey}
), e AS (
  SELECT DISTINCT a.o_custkey AS u, b.o_custkey AS v
  FROM co a JOIN co b
    ON a.o_orderdate = b.o_orderdate AND a.o_custkey < b.o_custkey
), t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
), nodes AS (
  SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY node ORDER BY node
"""


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node, exact-integer per-mille:
    ``coeff_pm = (1000 * 2 * triangles(n)) div (deg(n) * (deg(n) - 1))``
    for nodes of degree >= 2 (degree-1 nodes have no wedge to close and
    report 0). The transitivity QA companion to triangle_census — a
    dedup cluster whose members all show coeff_pm near 1000 is
    clique-like; low coefficients flag chain-shaped components whose
    ends were merged through intermediates."""
    e = (
        edges.selectExpr("least(u, v) AS u", "greatest(u, v) AS v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.selectExpr("u AS node")
        .unionAll(e.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    tri = triangle_census(e)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(1000 * 2 * coalesce(n_triangles, 0))"
                    " div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("coeff_pm"),
        )
    )
