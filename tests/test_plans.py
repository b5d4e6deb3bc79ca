"""Physical-plan regression tests — the .explain properties that matter at
100 TB, asserted in the suite (scripts/explain_audit.py is the full
manual audit; these are the fast invariants)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.plans import RELATIONAL_QUERIES


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_tiny):
    plan = _executed(RELATIONAL_QUERIES["q6_filtered_revenue"](spark, sf_tiny))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "l_comment" not in plan  # column pruning: no unused columns read


def test_topk_fuses_to_take_ordered(spark, sf_tiny):
    plan = _executed(RELATIONAL_QUERIES["q_topk"](spark, sf_tiny))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_dim_joins_broadcast_no_cartesian(spark, sf_tiny):
    plan = _executed(RELATIONAL_QUERIES["q5_local_suppliers"](spark, sf_tiny))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q4_broadcasts_filtered_orders(spark, sf_tiny):
    """r6 plan rewrite: the EXISTS is stated as broadcast(filtered
    orders) inner join + distinct-on-orderkey, so lineitem is neither
    shuffled nor broadcast (the LeftSemi form could only build its
    right side and at sf1.0 broadcast the whole lineitem scan). The
    EXISTS->LeftSemi decorrelation capability stays plan-asserted via
    the semi-join gates (g_join_filter_modes / q20)."""
    plan = _executed(RELATIONAL_QUERIES["q4_order_priority"](spark, sf_tiny))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_scan_reads_pruned_schema(spark, sf_tiny):
    df = RELATIONAL_QUERIES["q_topk"](spark, sf_tiny)
    plan = _executed(df)
    # only the two projected columns reach the scan
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan


def _live_nodes(df):
    """Node names of the physical plan that will actually EXECUTE for this
    DataFrame: unwraps AQE and stops at InMemoryTableScan (its cached
    lineage is printed by toString but never re-run, so a naive regex over
    the string over-counts parquet scans)."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.inputPlan()
    out = []

    def walk(node):
        name = node.nodeName()
        out.append(name)
        if "InMemoryTableScan" in name:
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(plan)
    return out


def test_lm_scores_plan_single_training_scan(spark, sf_tiny):
    """The LM model is persisted: training must read the corpus exactly
    once (at query-build time, inside the materialized cache) — the live
    plan carries only the scoring scan + the doc_id-only join scan, serves
    the model from InMemoryTableScan, and broadcasts both model joins at
    this vocabulary size. (The final doc_id join of two corpus-sized sides
    is legitimately a shuffle join, so no assertion on it.)"""
    from hyrise_generalized_dedup_spark.functions.queries import TEXT_QUERIES

    df = TEXT_QUERIES["text_lm_scores"](spark, sf_tiny)
    nodes = _live_nodes(df)
    n_parquet = sum(1 for n in nodes if "Scan parquet" in n)
    assert n_parquet <= 2, f"model lineage recomputed live: {n_parquet} parquet scans"
    n_imts = sum(1 for n in nodes if "InMemoryTableScan" in n)
    assert n_imts >= 3, nodes  # pair, ctx, vocab all served from the cache
    assert sum(1 for n in nodes if n == "BroadcastHashJoin") >= 2, nodes


def test_contamination_spans_plan_shape(spark, sf_tiny):
    """Eval grams broadcast; the only range-free exchanges key on doc_id
    (window + aggregates); no cartesian product anywhere."""
    from hyrise_generalized_dedup_spark.functions.queries import TEXT_QUERIES

    df = TEXT_QUERIES["text_contamination_spans"](spark, sf_tiny)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_plan_single_training_scan(spark, sf_tiny):
    """The DSIR model is persisted: both models (raw + target) come from
    ONE cached bucket groupBy, so the live plan reads the corpus at most
    twice (score grams + the doc_id-only restore join), serves the model
    and its totals from InMemoryTableScan, and broadcasts the score join
    (the model is buckets-bounded). The single cross join must be the
    1-row totals broadcast, never a corpus-sided product."""
    from hyrise_generalized_dedup_spark.functions.queries import TEXT_QUERIES

    df = TEXT_QUERIES["text_dsir_weights"](spark, sf_tiny)
    nodes = _live_nodes(df)
    n_parquet = sum(1 for n in nodes if "Scan parquet" in n)
    assert n_parquet <= 2, f"model lineage recomputed live: {n_parquet} parquet scans"
    assert sum(1 for n in nodes if "InMemoryTableScan" in n) >= 2, nodes
    assert sum(1 for n in nodes if n == "BroadcastHashJoin") >= 1, nodes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
