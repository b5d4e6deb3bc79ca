"""Table-statistics (ANALYZE) tests: bin-count heuristic, null ratios,
scan-selectivity estimation vs true selectivities, column-vs-column scans,
and join-mode estimates — mirroring table_statistics.cpp and
cardinality_estimator.cpp semantics."""

from __future__ import annotations

import pytest

from hyrise_generalized_dedup_spark.stats.table import (
    PLACEHOLDER_SELECTIVITY_ALL,
    PLACEHOLDER_SELECTIVITY_HIGH,
    PLACEHOLDER_SELECTIVITY_LOW,
    analyze_table,
    estimate_column_vs_column_equi_scan,
    estimate_join_cardinality,
    estimate_scan_cardinality,
    estimate_scan_selectivity,
    histogram_bin_count_for,
)
from hyrise_generalized_dedup_spark.stats.histogram import GenericHistogram

approx = pytest.approx


def test_bin_count_heuristic():
    # table_statistics.cpp:24 — 5 bins <=2k rows, 100 bins >=200m rows
    assert histogram_bin_count_for(0) == 5
    assert histogram_bin_count_for(2_000) == 5
    assert histogram_bin_count_for(20_000) == 10
    assert histogram_bin_count_for(200_000_000) == 100
    assert histogram_bin_count_for(10**12) == 100


class TestAnalyzeTable:
    @pytest.fixture(scope="class")
    def mixed_df(self, spark):
        rows = [(i, i % 7 if i % 4 else None, f"s{i % 5}") for i in range(200)]
        return spark.createDataFrame(rows, "k bigint, v int, s string")

    def test_null_ratio_exact(self, mixed_df):
        stats = analyze_table(mixed_df, max_bins=8)
        n_null = sum(1 for i in range(200) if i % 4 == 0)
        assert stats.row_count == 200.0
        assert stats.column_statistics["v"].null_value_ratio == approx(n_null / 200)
        assert stats.column_statistics["k"].null_value_ratio == 0.0
        assert stats.column_statistics["k"].histogram.total_count() == 200.0

    def test_all_null_column(self, spark):
        df = spark.createDataFrame([(1, None), (2, None)], "a bigint, b string")
        stats = analyze_table(df, max_bins=4)
        assert stats.column_statistics["b"].histogram is None
        assert stats.column_statistics["b"].null_value_ratio == 1.0
        assert estimate_scan_selectivity(stats, "b", "=", "x") == 0.0

    def test_timestamp_column_gets_null_ratio_only(self, spark, sf_tiny):
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        stats = analyze_table(
            orders, columns=["o_custkey", "o_orderdate"], max_bins=8
        )
        assert stats.column_statistics["o_custkey"].histogram is not None
        od = stats.column_statistics["o_orderdate"]
        assert od.histogram is None
        assert od.null_value_ratio == 0.0
        assert (
            estimate_scan_selectivity(stats, "o_orderdate", "=", "1995-01-01")
            == PLACEHOLDER_SELECTIVITY_ALL
        )

    def test_is_null_estimates_exact(self, mixed_df):
        stats = analyze_table(mixed_df, max_bins=8)
        true_null = sum(1 for i in range(200) if i % 4 == 0)
        assert estimate_scan_cardinality(stats, "v", "is null") == approx(true_null)
        assert estimate_scan_cardinality(stats, "v", "is not null") == approx(
            200 - true_null
        )

    def test_like_placeholders(self, mixed_df):
        stats = analyze_table(mixed_df, max_bins=8)
        assert estimate_scan_selectivity(stats, "s", "like", "s%") == (
            PLACEHOLDER_SELECTIVITY_LOW
        )
        assert estimate_scan_selectivity(stats, "s", "not like", "s%") == (
            PLACEHOLDER_SELECTIVITY_HIGH
        )

    def test_null_comparison_selects_nothing(self, mixed_df):
        stats = analyze_table(mixed_df, max_bins=8)
        assert estimate_scan_selectivity(stats, "v", "=", None) == 0.0


class TestScanAccuracy:
    def test_range_scan_on_orders(self, spark, sf_tiny):
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        stats = analyze_table(orders, columns=["o_totalprice"], max_bins=16)
        hist = stats.column_statistics["o_totalprice"].histogram
        cut = hist.maxima[len(hist.maxima) // 2]
        est = estimate_scan_cardinality(stats, "o_totalprice", "<=", cut)
        true = orders.where(f"o_totalprice <= {cut}").count()
        # cutting exactly at a bin maximum is exact up to float error
        assert est == approx(true, rel=1e-6)

    def test_equals_scan_on_orders(self, spark, sf_tiny):
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        stats = analyze_table(orders, columns=["o_orderstatus"], max_bins=4)
        est = estimate_scan_cardinality(stats, "o_orderstatus", "=", "O")
        true = orders.where("o_orderstatus = 'O'").count()
        hist = stats.column_statistics["o_orderstatus"].histogram
        b = hist._bin_for_value("O")
        assert abs(est - true) <= hist.heights[b]  # bounded by the bin


class TestColumnVsColumn:
    def test_identical_columns_high_estimate(self):
        h = GenericHistogram([0, 10], [9, 19], [50, 50], [10, 10], kind="int")
        scanned = estimate_column_vs_column_equi_scan(h, h)
        assert scanned.total_count() == approx(100.0)

    def test_disjoint_columns_zero(self):
        a = GenericHistogram([0], [9], [50], [10], kind="int")
        b = GenericHistogram([100], [109], [50], [10], kind="int")
        assert estimate_column_vs_column_equi_scan(a, b) is None


class TestJoinModes:
    @pytest.fixture(scope="class")
    def two_tables(self, spark, sf_tiny):
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        customer = spark.read.parquet(f"{sf_tiny}/customer.parquet")
        so = analyze_table(orders, columns=["o_custkey"], max_bins=16)
        sc = analyze_table(customer, columns=["c_custkey"], max_bins=16)
        return orders, customer, so, sc

    def test_cross(self, two_tables):
        orders, customer, so, sc = two_tables
        est = estimate_join_cardinality(so, sc, "o_custkey", "c_custkey", "cross")
        assert est == approx(orders.count() * customer.count())

    def test_outer_modes_match_inner(self, two_tables):
        _, _, so, sc = two_tables
        inner = estimate_join_cardinality(so, sc, "o_custkey", "c_custkey", "inner")
        for mode in ("left", "right", "full"):
            assert estimate_join_cardinality(
                so, sc, "o_custkey", "c_custkey", mode
            ) == approx(inner)

    def test_semi_anti_partition(self, two_tables):
        orders, customer, so, sc = two_tables
        semi = estimate_join_cardinality(so, sc, "o_custkey", "c_custkey", "semi")
        anti = estimate_join_cardinality(so, sc, "o_custkey", "c_custkey", "anti")
        assert semi + anti == approx(orders.count())
        true_semi = orders.join(
            customer, orders.o_custkey == customer.c_custkey, "left_semi"
        ).count()
        assert semi == approx(true_semi, rel=0.15)
