"""Join-ordering tests: GOO picks the most selective edge first, DpCcp
is optimal against brute-force enumeration on its own cost model,
intermediate statistics propagate per the reference's estimator, and
executed plans return the same rows regardless of the chosen order."""

from __future__ import annotations

import pytest

from hyrise_generalized_dedup_spark.stats.histogram import GenericHistogram
from hyrise_generalized_dedup_spark.stats.ordering import (
    JoinEdge,
    dp_ccp,
    execute_plan,
    greedy_operator_ordering,
    join_table_statistics,
    plan_order,
)
from hyrise_generalized_dedup_spark.stats.table import (
    AttributeStatistics,
    TableStatistics,
    analyze_table,
)

approx = pytest.approx


def _table(rows: float, cols: dict[str, GenericHistogram]) -> TableStatistics:
    return TableStatistics(
        rows, {n: AttributeStatistics(h, 0.0) for n, h in cols.items()}
    )


def _uniform(lo: int, hi: int, rows: float) -> GenericHistogram:
    n = hi - lo + 1
    return GenericHistogram([lo], [hi], [rows], [n], kind="int")


class TestIntermediateStats:
    def test_fk_join_propagation(self):
        # dim: 100 distinct keys 0..99 once each; fact: 1000 rows over same keys
        dim = _table(100, {"d_k": _uniform(0, 99, 100)})
        fact = _table(1000, {"f_k": _uniform(0, 99, 1000)})
        out = join_table_statistics(fact, dim, "f_k", "d_k")
        assert out.row_count == approx(1000.0)
        # join column carries the joined histogram
        assert out.column_statistics["f_k"].histogram.total_count() == approx(1000.0)

    def test_string_fallback_is_cross(self):
        a = _table(10, {"s": GenericHistogram(["a"], ["z"], [10], [5], kind="str")})
        b = _table(20, {"t": GenericHistogram(["a"], ["z"], [20], [5], kind="str")})
        out = join_table_statistics(a, b, "s", "t")
        assert out.row_count == approx(200.0)

    def test_other_columns_scaled(self):
        left = _table(
            100, {"k": _uniform(0, 9, 100), "payload": _uniform(0, 999, 100)}
        )
        right = _table(10, {"k2": _uniform(0, 9, 10)})
        out = join_table_statistics(left, right, "k", "k2")
        assert out.row_count == approx(100.0)
        # payload scaled by selectivity 1.0 here; present with a histogram
        assert out.column_statistics["payload"].histogram is not None


def _chain_fixture():
    """a -(selective)- b -(explosive)- c: joining (a,b) first is cheapest."""
    a = _table(10, {"a_k": _uniform(0, 9, 10)})
    b = _table(
        1000, {"b_k": _uniform(0, 9, 1000), "b_j": _uniform(0, 49, 1000)}
    )
    c = _table(5000, {"c_j": _uniform(0, 49, 5000)})
    edges = [
        JoinEdge("a", "b", "a_k", "b_k"),
        JoinEdge("b", "c", "b_j", "c_j"),
    ]
    return {"a": a, "b": b, "c": c}, edges


class TestGreedy:
    def test_picks_selective_edge_first(self):
        tables, edges = _chain_fixture()
        plan, stats, cost = greedy_operator_ordering(tables, edges)

        # the innermost join (both children scans) must be a-b (1000 rows),
        # not b-c (100k rows)
        def leaf_joins(p):
            if p[0] == "scan":
                return []
            inner = leaf_joins(p[1]) + leaf_joins(p[2])
            if p[1][0] == "scan" and p[2][0] == "scan":
                inner.append({p[1][1], p[2][1]})
            return inner

        assert {"a", "b"} in leaf_joins(plan)
        assert stats.row_count == approx(100_000.0)

    def test_disconnected_raises(self):
        tables, _ = _chain_fixture()
        with pytest.raises(ValueError, match="disconnected"):
            greedy_operator_ordering(tables, [JoinEdge("a", "b", "a_k", "b_k")])

    def test_two_tables(self):
        tables, edges = _chain_fixture()
        sub = {k: tables[k] for k in ("a", "b")}
        plan, stats, cost = greedy_operator_ordering(sub, edges[:1])
        assert plan[0] == "join"
        assert stats.row_count == approx(1000.0)
        assert cost == approx(10 + 1000 + 1000)


class TestDpCcp:
    def test_matches_brute_force_on_chain(self):
        tables, edges = _chain_fixture()
        plan, stats, cost = dp_ccp(tables, edges)
        # brute force: both left-deep orders of the chain
        #   (a⋈b)⋈c: cost1 = (10+1000+1000) + (1000+5000+100000)
        #   a⋈(b⋈c): cost2 = (1000+5000+100000) + (10+100000+100000)
        cost1 = (10 + 1000 + 1000) + (1000 + 5000 + 100_000)
        cost2 = (1000 + 5000 + 100_000) + (10 + 100_000 + 100_000)
        assert cost == approx(min(cost1, cost2))
        assert plan_order(plan)[:2] in (["a", "b"], ["b", "a"])

    def test_optimal_on_random_star(self):
        # star: fact joins three dims of different selectivities
        fact = _table(
            10_000,
            {
                "f_a": _uniform(0, 99, 10_000),
                "f_b": _uniform(0, 9, 10_000),
                "f_c": _uniform(0, 999, 10_000),
            },
        )
        dims = {
            "da": _table(100, {"da_k": _uniform(0, 99, 100)}),
            "db": _table(10, {"db_k": _uniform(0, 9, 10)}),
            "dc": _table(1000, {"dc_k": _uniform(0, 999, 1000)}),
        }
        tables = {"f": fact, **dims}
        edges = [
            JoinEdge("f", "da", "f_a", "da_k"),
            JoinEdge("f", "db", "f_b", "db_k"),
            JoinEdge("f", "dc", "f_c", "dc_k"),
        ]
        plan, stats, cost = dp_ccp(tables, edges)
        assert stats.row_count == approx(10_000.0)
        # DP cost must not exceed the greedy cost
        _, _, gcost = greedy_operator_ordering(tables, edges)
        assert cost <= gcost + 1e-6

    def test_cap(self):
        tables = {f"t{i}": _table(10, {f"k{i}": _uniform(0, 9, 10)}) for i in range(13)}
        edges = [
            JoinEdge(f"t{i}", f"t{i+1}", f"k{i}", f"k{i+1}") for i in range(12)
        ]
        with pytest.raises(ValueError, match="capped"):
            dp_ccp(tables, edges)


class TestEndToEnd:
    def test_tpch_chain_executes_correctly(self, spark, sf_tiny):
        frames = {
            "region": spark.read.parquet(f"{sf_tiny}/region.parquet"),
            "nation": spark.read.parquet(f"{sf_tiny}/nation.parquet"),
            "supplier": spark.read.parquet(f"{sf_tiny}/supplier.parquet"),
        }
        tables = {
            "region": analyze_table(frames["region"], ["r_regionkey"], max_bins=8),
            "nation": analyze_table(
                frames["nation"], ["n_regionkey", "n_nationkey"], max_bins=8
            ),
            "supplier": analyze_table(frames["supplier"], ["s_nationkey"], max_bins=8),
        }
        edges = [
            JoinEdge("region", "nation", "r_regionkey", "n_regionkey"),
            JoinEdge("nation", "supplier", "n_nationkey", "s_nationkey"),
        ]
        for algo in (greedy_operator_ordering, dp_ccp):
            plan, stats, _ = algo(tables, edges)
            got = execute_plan(plan, frames).count()
            true = (
                frames["region"]
                .join(
                    frames["nation"],
                    frames["region"].r_regionkey == frames["nation"].n_regionkey,
                )
                .join(
                    frames["supplier"],
                    frames["nation"].n_nationkey == frames["supplier"].s_nationkey,
                )
                .count()
            )
            assert got == true
            assert stats.row_count == approx(true, rel=0.2)

    def test_order_agnostic_results(self, spark, sf_tiny):
        """Every enumerable order of the 3-chain returns identical rows —
        the optimizer changes cost, never semantics."""
        frames = {
            "region": spark.read.parquet(f"{sf_tiny}/region.parquet"),
            "nation": spark.read.parquet(f"{sf_tiny}/nation.parquet"),
            "supplier": spark.read.parquet(f"{sf_tiny}/supplier.parquet"),
        }
        e_rn = JoinEdge("region", "nation", "r_regionkey", "n_regionkey")
        e_ns = JoinEdge("nation", "supplier", "n_nationkey", "s_nationkey")
        plans = [
            ("join", ("join", ("scan", "region"), ("scan", "nation"), e_rn),
             ("scan", "supplier"), e_ns),
            ("join", ("scan", "region"),
             ("join", ("scan", "nation"), ("scan", "supplier"), e_ns), e_rn),
        ]
        counts = {execute_plan(p, frames).count() for p in plans}
        assert len(counts) == 1


def test_cyclic_graph_keeps_all_predicates(spark):
    """ADVICE r5 (high): a triangle-shaped join graph must apply ALL
    three edges — GOO/DpCcp previously dropped the edge that became
    internal to a merged cluster, returning rows that violate it. The
    correct row set is the one DuckDB-equivalent three-way equi-join with
    all three predicates."""
    import pyspark.sql.functions as F

    from hyrise_generalized_dedup_spark.stats.ordering import (
        JoinEdge,
        dp_ccp,
        execute_plan,
        greedy_operator_ordering,
    )
    from hyrise_generalized_dedup_spark.stats.table import analyze_table

    a = spark.createDataFrame([(i, i % 3) for i in range(30)], "ka long, va long")
    b = spark.createDataFrame([(i % 5, i % 3) for i in range(40)], "kb long, vb long")
    c = spark.createDataFrame([(i % 7, i % 5) for i in range(50)], "kc long, vc long")
    frames = {"a": a, "b": b, "c": c}
    edges = [
        JoinEdge("a", "b", "va", "vb"),
        JoinEdge("b", "c", "kb", "vc"),
        JoinEdge("c", "a", "kc", "ka"),  # closes the cycle
    ]
    expected = (
        a.alias("a")
        .join(b.alias("b"), F.col("a.va") == F.col("b.vb"))
        .join(
            c.alias("c"),
            (F.col("b.kb") == F.col("c.vc")) & (F.col("c.kc") == F.col("a.ka")),
        )
        .count()
    )
    stats = {n: analyze_table(frames[n], max_bins=8) for n in frames}
    for planner in (greedy_operator_ordering, dp_ccp):
        plan, _st, _cost = planner(stats, edges)
        assert execute_plan(plan, frames).count() == expected, planner.__name__


def test_execute_plan_resolves_same_named_columns_by_vertex(spark):
    """ADVICE r5 (low): edge columns resolve against their DECLARED
    vertex even when both subtrees carry a column of that name."""
    from hyrise_generalized_dedup_spark.stats.ordering import (
        JoinEdge,
        execute_plan,
    )

    a = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b = spark.createDataFrame([(10, 7), (99, 8)], "k long, w long")
    # edge joins a.v (not a.k!) to b.k — both frames carry a column 'k',
    # so the old name-membership lookup picked a.k and returned 0 rows
    plan = ("join", ("scan", "a"), ("scan", "b"), JoinEdge("a", "b", "v", "k"))
    got = execute_plan(plan, {"a": a, "b": b}).count()
    assert got == 1
