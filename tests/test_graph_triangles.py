"""Exact triangle census (functions/graph.py triangle_census).

Oracles: brute-force enumeration on random graphs, closed-form counts on
planted cliques, and structural zeros (trees / bipartite graphs).
"""

from __future__ import annotations

import itertools
import random

import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.functions.graph import (
    codate_customer_edges,
    triangle_census,
)


def _census(spark, pairs):
    df = spark.createDataFrame(pairs, "u bigint, v bigint")
    return {
        r["node"]: r["n_triangles"] for r in triangle_census(df).collect()
    }


def _brute(pairs):
    eset = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({x for p in eset for x in p})
    counts: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_census_matches_bruteforce_random(spark):
    rnd = random.Random(23)
    pairs = [
        (rnd.randint(0, 40), rnd.randint(0, 40)) for _ in range(300)
    ]
    assert _census(spark, pairs) == _brute(pairs)


def test_planted_clique_counts_closed_form(spark):
    k = 9
    clique = [(i, j) for i in range(k) for j in range(i + 1, k)]
    # plus a pendant chain that adds no triangles
    chain = [(100, 101), (101, 102), (102, 103)]
    got = _census(spark, clique + chain)
    per_node = (k - 1) * (k - 2) // 2
    assert got == {i: per_node for i in range(k)}
    total = sum(got.values()) // 3
    assert total == k * (k - 1) * (k - 2) // 6


def test_trees_and_bipartite_have_no_triangles(spark):
    tree = [(0, i) for i in range(1, 8)] + [(1, 10), (1, 11)]
    assert _census(spark, tree) == {}
    bipartite = [(i, 100 + j) for i in range(5) for j in range(5)]
    assert _census(spark, bipartite) == {}


def test_duplicate_reversed_and_self_edges_canonicalized(spark):
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 3), (1, 1)]
    assert _census(spark, pairs) == {1: 1, 2: 1, 3: 1}


def test_partitioning_invariance(spark):
    rnd = random.Random(5)
    pairs = [(rnd.randint(0, 30), rnd.randint(0, 30)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "u bigint, v bigint")
    a = sorted(map(tuple, triangle_census(df).collect()))
    b = sorted(map(tuple, triangle_census(df.repartition(13)).collect()))
    assert a == b


def test_codate_edges_bounded_and_canonical(spark, sf_tiny):
    orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
    edges = codate_customer_edges(orders, max_custkey=50).collect()
    assert all(r["u"] < r["v"] < 50 for r in edges)
    assert len(edges) == len({(r["u"], r["v"]) for r in edges})


def test_triangle_plan_no_cartesian(spark):
    df = spark.range(100).selectExpr("id AS u", "id % 37 AS v")
    plan = triangle_census(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_clustering_coefficients_exact(spark):
    from hyrise_generalized_dedup_spark.functions.graph import (
        clustering_coefficients,
    )

    # triangle 0-1-2 plus pendant 2-3: nodes 0,1 close their only wedge
    # (coeff 1000); node 2 has degree 3 -> 2*1/(3*2) = 333; node 3 deg 1
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "u bigint, v bigint"
    )
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["coeff_pm"])
        for r in clustering_coefficients(df).collect()
    }
    assert got == {
        0: (2, 1, 1000),
        1: (2, 1, 1000),
        2: (3, 1, 333),
        3: (1, 0, 0),
    }


def test_clustering_coefficients_clique_is_1000(spark):
    from hyrise_generalized_dedup_spark.functions.graph import (
        clustering_coefficients,
    )

    k = 6
    clique = [(i, j) for i in range(k) for j in range(i + 1, k)]
    rows = clustering_coefficients(
        spark.createDataFrame(clique, "u bigint, v bigint")
    ).collect()
    assert all(r["coeff_pm"] == 1000 for r in rows) and len(rows) == k
