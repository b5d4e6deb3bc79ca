"""Exact-integer PageRank (functions/graph.py) oracles.

The driver gate (graph_pagerank_entities in g_ann_dedup) hash-checks the
full trajectory against the generated DuckDB CTE chain; here a
from-scratch Python twin replays the recurrence on a toy graph, plus
semantic and invariance properties.
"""

from __future__ import annotations

import pytest

from hyrise_generalized_dedup_spark.functions.graph import (
    BASE_NUM,
    DAMP_DEN,
    DAMP_NUM,
    ITERS,
    TOTAL_MASS,
    entity_edges,
    pagerank,
    pagerank_entities,
    pagerank_oracle_sql,
)
from hyrise_generalized_dedup_spark.sources.tables import load_table
from hyrise_generalized_dedup_spark.testing import duckdb_conn

# Toy directed edge list (already both-directions where undirected):
# hub 0 connected to 1..4; 5-6 a far pair reachable via 4.
_EDGES = (
    [(0, i) for i in range(1, 5)]
    + [(i, 0) for i in range(1, 5)]
    + [(4, 5), (5, 4), (5, 6), (6, 5)]
)


def _twin(edges, iters=ITERS):
    nodes = sorted({s for s, _ in edges})
    deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    n = len(nodes)
    r0 = TOTAL_MASS // n
    base = (BASE_NUM * r0) // DAMP_DEN
    r = {m: r0 for m in nodes}
    for _ in range(iters):
        inflow = {m: 0 for m in nodes}
        for s, d in edges:
            inflow[d] += r[s] // deg[s]
        r = {m: base + (DAMP_NUM * inflow[m]) // DAMP_DEN for m in nodes}
    return deg, r


@pytest.fixture(scope="module")
def toy_result(spark):
    edges = spark.createDataFrame(_EDGES, ["src", "dst"])
    return {r["node"]: r for r in pagerank(edges).collect()}


def test_toy_matches_python_twin(toy_result):
    deg, ranks = _twin(_EDGES)
    assert set(toy_result) == set(deg)
    for n in deg:
        assert toy_result[n]["degree"] == deg[n], n
        assert toy_result[n]["rank"] == ranks[n], n


def test_hub_outranks_leaves(toy_result):
    hub = toy_result[0]["rank"]
    for leaf in (1, 2, 3, 6):
        assert hub > toy_result[leaf]["rank"], leaf


def test_partitioning_invariance(spark):
    e1 = spark.createDataFrame(_EDGES, ["src", "dst"]).coalesce(1)
    e7 = spark.createDataFrame(_EDGES, ["src", "dst"]).repartition(7)
    r1 = sorted((r["node"], r["rank"]) for r in pagerank(e1).collect())
    r7 = sorted((r["node"], r["rank"]) for r in pagerank(e7).collect())
    assert r1 == r7  # all-integer recurrence: exact under any layout


def test_real_tables_match_duckdb_replay(spark, sf_tiny):
    df = pagerank_entities(
        spark,
        load_table(spark, sf_tiny, "lineitem"),
        load_table(spark, sf_tiny, "orders"),
    )
    got = sorted(
        (r["node_kind"], r["entity_id"], r["degree"], r["rank"])
        for r in df.collect()
    )
    exp = sorted(
        tuple(r) for r in duckdb_conn(sf_tiny).execute(pagerank_oracle_sql()).fetchall()
    )
    assert got == exp and len(got) > 50


def test_entity_encoding_disjoint(spark, sf_tiny):
    edges = entity_edges(
        load_table(spark, sf_tiny, "lineitem"),
        load_table(spark, sf_tiny, "orders"),
    )
    row = edges.selectExpr(
        "sum(case when src % 2 = 0 then 1 else 0 end) as even_src",
        "count(*) as total",
    ).collect()[0]
    # Bipartite both-directions: exactly half the directed edges leave
    # customer (even) nodes.
    assert row["even_src"] * 2 == row["total"]


def test_empty_graph(spark):
    edges = spark.createDataFrame([], "src LONG, dst LONG")
    assert pagerank(edges).count() == 0
