"""Join cardinality estimation tests — parity with the reference's own
unit-test expectations (cardinality_estimator_test.cpp:304-372,
generic_histogram_test.cpp:1085-1180) plus accuracy checks against TRUE
Spark join counts on the TPC-H testdata (histograms built via the
distributed EDC path)."""

from __future__ import annotations

import pytest

from hyrise_generalized_dedup_spark.stats import (
    EqualDistinctCountHistogram,
    GenericHistogram,
    estimate_cross_join,
    estimate_inner_equi_join,
    estimate_inner_equi_join_of_bins,
    estimate_inner_equi_join_with_histograms,
    estimate_semi_join,
    scaled,
    split_at_bin_bounds,
)
from hyrise_generalized_dedup_spark.stats.estimator import bin_bounds

approx = pytest.approx


class TestJoinOfBins:
    """cardinality_estimator_test.cpp JoinBinsInnerEqui — every case."""

    @pytest.mark.parametrize(
        "lh,ld,rh,rd,height,distinct",
        [
            (1, 1, 1, 1, 1.0, 1.0),
            (2, 1, 1, 1, 2.0, 1.0),
            (2, 1, 2, 1, 4.0, 1.0),
            (2, 2, 2, 1, 2.0, None),
            (2, 2, 1, 1, None, 1.0),
            (200, 20, 3000, 2500, 240.0, 20.0),
            (2, 3, 2, 7, 0.5714286, None),
            (2, 3, 1, 7, None, 3.0),
            (2, 0.1, 2, 1, 4.0, 0.1),
            (0, 0, 2, 1, 0.0, 0.0),
            (200, 20, 3000, 0.1, 30000.0, 0.1),
            (200, 1, 0.3, 0.3, 60.0, 0.3),
        ],
    )
    def test_reference_cases(self, lh, ld, rh, rd, height, distinct):
        got_h, got_d = estimate_inner_equi_join_of_bins(lh, ld, rh, rd)
        if height is not None:
            assert got_h == approx(height, rel=1e-6)
        if distinct is not None:
            assert got_d == approx(distinct, rel=1e-6)

    def test_symmetry(self):
        a = estimate_inner_equi_join_of_bins(7, 3, 11, 5)
        b = estimate_inner_equi_join_of_bins(11, 5, 7, 3)
        assert a == b


class TestSplitAtBinBounds:
    def test_reference_case(self):
        # generic_histogram_test.cpp SplitAtBinBounds
        hist = GenericHistogram(
            [1, 30, 60, 80], [25, 50, 75, 100], [40, 30, 20, 10], [10, 20, 15, 5],
            kind="int",
        )
        out = split_at_bin_bounds(hist, [(10, 15), (28, 35)])
        assert out.minima == [1, 10, 16, 30, 36, 60, 80]
        assert out.maxima == [9, 15, 25, 35, 50, 75, 100]
        assert out.heights == approx(
            [14.4, 9.6, 16.0, 8.57143, 21.42857, 20.0, 10.0], rel=1e-5
        )
        assert out.distinct_counts == approx(
            [3.6, 2.4, 4.0, 5.7142859, 14.285714, 15.0, 5.0], rel=1e-5
        )

    def test_two_histograms_reference_case(self):
        # generic_histogram_test.cpp SplitAtBinBoundsTwoHistograms
        h1 = GenericHistogram(
            [0, 5, 15, 20, 35, 45, 50], [4, 10, 18, 29, 40, 48, 51],
            [1] * 7, [1] * 7, kind="int",
        )
        h2 = GenericHistogram(
            [2, 12, 40, 45, 50], [7, 25, 42, 48, 52], [1] * 5, [1] * 5, kind="int"
        )
        n1 = split_at_bin_bounds(h1, bin_bounds(h2))
        n2 = split_at_bin_bounds(h2, bin_bounds(h1))
        assert n1.minima == [0, 2, 5, 8, 15, 20, 26, 35, 40, 45, 50]
        assert n1.maxima == [1, 4, 7, 10, 18, 25, 29, 39, 40, 48, 51]
        assert n2.minima == [2, 5, 12, 15, 19, 20, 40, 41, 45, 50, 52]
        assert n2.maxima == [4, 7, 14, 18, 19, 25, 40, 42, 48, 51, 52]

    def test_noop_split_preserves_totals(self):
        hist = GenericHistogram([1, 30], [25, 50], [40, 30], [10, 20], kind="int")
        out = split_at_bin_bounds(hist, [])
        assert out.total_count() == approx(hist.total_count())
        assert out.total_distinct_count() == approx(hist.total_distinct_count())
        assert out.minima == hist.minima and out.maxima == hist.maxima

    def test_string_histogram_rejected(self):
        hist = GenericHistogram(["a"], ["m"], [5], [3], kind="str")
        with pytest.raises(ValueError):
            split_at_bin_bounds(hist, [])


class TestScaled:
    def test_scaled_with_selectivity(self):
        # generic_histogram_test.cpp ScaledWithSelectivity shape
        hist = GenericHistogram(
            [1, 30, 60, 80], [25, 50, 75, 100], [40, 30, 20, 10], [10, 20, 15, 5],
            kind="int",
        )
        half = scaled(hist, 0.5)
        assert half.heights == approx([20, 15, 10, 5])
        # distinct capped at min(distinct, height * selectivity)
        assert half.distinct_counts == approx([10, 15, 10, 5])
        tiny = scaled(hist, 0.1)
        assert tiny.heights == approx([4, 3, 2, 1])
        assert tiny.distinct_counts == approx([4, 3, 2, 1])


class TestJoinWithHistograms:
    def test_reference_case(self):
        # cardinality_estimator_test.cpp JoinInnerEquiHistograms
        left = GenericHistogram(
            [0, 10, 20, 30, 40, 50, 60], [9, 19, 29, 39, 49, 59, 69],
            [10, 15, 10, 20, 5, 15, 5], [1, 1, 3, 8, 1, 5, 1], kind="int",
        )
        right = GenericHistogram(
            [20, 30, 50], [29, 39, 59], [10, 5, 10], [7, 2, 10], kind="int"
        )
        joined = estimate_inner_equi_join_with_histograms(left, right)
        assert joined.bin_count() == 3
        assert (joined.minima[0], joined.maxima[0]) == (20, 29)
        assert joined.heights[0] == approx(10.0 * 10.0 / 7.0, rel=1e-6)
        assert joined.distinct_counts[0] == approx(3.0)
        assert (joined.minima[1], joined.maxima[1]) == (30, 39)
        assert joined.heights[1] == approx(20.0 * 5.0 / 8.0, rel=1e-6)
        assert joined.distinct_counts[1] == approx(2.0)
        assert (joined.minima[2], joined.maxima[2]) == (50, 59)
        assert joined.heights[2] == approx(15.0 * 10.0 / 10.0, rel=1e-6)
        assert joined.distinct_counts[2] == approx(5.0)

    def test_disjoint_histograms_no_matches(self):
        left = GenericHistogram([0], [9], [10], [5], kind="int")
        right = GenericHistogram([100], [200], [10], [5], kind="int")
        assert estimate_inner_equi_join_with_histograms(left, right) is None
        assert estimate_inner_equi_join(left, right, 10, 10) == 0.0

    def test_string_falls_back_to_cross(self):
        s = GenericHistogram(["a"], ["m"], [5], [3], kind="str")
        assert estimate_inner_equi_join(s, s, 5, 7) == 35.0
        assert estimate_cross_join(5, 7) == 35.0

    def test_semi_join_capped(self):
        left = GenericHistogram([0], [9], [100], [10], kind="int")
        right = GenericHistogram([0], [9], [1000], [10], kind="int")
        # all 10 left distincts find a match; semi keeps every left row
        assert estimate_semi_join(left, right, 100) == approx(100.0)
        small_right = GenericHistogram([0], [4], [50], [5], kind="int")
        est = estimate_semi_join(left, small_right, 100)
        assert 0 < est < 100


class TestAccuracyOnRealJoins:
    """End-to-end: distributed EDC histograms -> inclusion estimate vs the
    TRUE Spark join count. FK joins on near-uniform TPC-H keys are the
    sweet spot of the principle of inclusion; assert tight relative error."""

    def test_orders_customer_fk_join(self, spark, sf_tiny):
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        customer = spark.read.parquet(f"{sf_tiny}/customer.parquet")
        h_o = EqualDistinctCountHistogram.from_dataframe(orders, "o_custkey", 16)
        h_c = EqualDistinctCountHistogram.from_dataframe(customer, "c_custkey", 16)
        est = estimate_inner_equi_join(h_o, h_c, orders.count(), customer.count())
        true = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
        assert est == approx(true, rel=0.15)

    def test_lineitem_orders_fk_join(self, spark, sf_tiny):
        li = spark.read.parquet(f"{sf_tiny}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        h_l = EqualDistinctCountHistogram.from_dataframe(li, "l_orderkey", 16)
        h_o = EqualDistinctCountHistogram.from_dataframe(orders, "o_orderkey", 16)
        est = estimate_inner_equi_join(h_l, h_o, li.count(), orders.count())
        true = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert est == approx(true, rel=0.15)

    def test_semi_join_accuracy(self, spark, sf_tiny):
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        customer = spark.read.parquet(f"{sf_tiny}/customer.parquet")
        h_o = EqualDistinctCountHistogram.from_dataframe(orders, "o_custkey", 16)
        h_c = EqualDistinctCountHistogram.from_dataframe(customer, "c_custkey", 16)
        est = estimate_semi_join(h_o, h_c, orders.count())
        true = orders.join(
            customer, orders.o_custkey == customer.c_custkey, "left_semi"
        ).count()
        assert est == approx(true, rel=0.15)
        assert est <= orders.count()
