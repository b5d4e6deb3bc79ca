"""Layer-3-style golden-oracle tests (SURVEY.md §5): every relational query
vs DuckDB on the tiny fixture — the same comparison the driver's
correctness gate performs at sf0.01."""

from __future__ import annotations

import pytest

from hyrise_generalized_dedup_spark.plans import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)
from hyrise_generalized_dedup_spark.testing import compare_to_duckdb


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_relational_query_matches_duckdb(spark, sf_tiny, name):
    fn = RELATIONAL_QUERIES[name]
    # engine-specific sketches (q_approx_distinct) carry a committed-golden
    # oracle pinned to sf0.01 (goldens.py) — compare those at the goldens'
    # scale; every other oracle recomputes at sf_tiny
    assert name in RELATIONAL_ORACLES, f"{name} must have an oracle"
    sf = "/root/testdata/sf0.01" if "sf0_01.parquet" in RELATIONAL_ORACLES[name] else sf_tiny
    df = fn(spark, sf)
    ok, msg = compare_to_duckdb(df, RELATIONAL_ORACLES[name], sf)
    assert ok, f"{name}: {msg}"


def test_all_queries_have_oracles():
    assert set(RELATIONAL_ORACLES) == set(RELATIONAL_QUERIES)


def test_approx_distinct_within_tolerance(spark, sf_small):
    """HLL++ sketch within 5% of exact (the reference keeps only exact
    COUNT DISTINCT; the sketch is our 10^12-row extension)."""
    import pyspark.sql.functions as F

    from hyrise_generalized_dedup_spark.sources.tables import load_table

    e = load_table(spark, sf_small, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
