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


def test_exists_decorrelates_to_semi_join(spark, sf_tiny):
    plan = _executed(RELATIONAL_QUERIES["q4_order_priority"](spark, sf_tiny))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_scan_reads_pruned_schema(spark, sf_tiny):
    df = RELATIONAL_QUERIES["q_topk"](spark, sf_tiny)
    plan = _executed(df)
    # only the two projected columns reach the scan
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan
