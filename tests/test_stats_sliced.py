"""sliced() + apply_scan tests: the sliced total equals the cardinality
estimate for every condition, bounds trim correctly, and chained
scan+join estimation tracks true cardinalities on TPC-H shapes."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from hyrise_generalized_dedup_spark.stats.estimator import sliced
from hyrise_generalized_dedup_spark.stats.histogram import GenericHistogram
from hyrise_generalized_dedup_spark.stats.ordering import join_table_statistics
from hyrise_generalized_dedup_spark.stats.table import analyze_table, apply_scan

approx = pytest.approx

HIST = GenericHistogram(
    [2, 21, 37, 101, 105],
    [20, 25, 100, 103, 105],
    [17, 30, 40, 1, 5],
    [5, 3, 27, 1, 1],
    kind="int",
)


class TestSlicedTotalsMatchEstimates:
    @pytest.mark.parametrize("cond", ["=", "!=", "<", "<=", ">", ">="])
    @pytest.mark.parametrize("v", [2, 3, 20, 21, 26, 40, 100, 104, 105])
    def test_total_equals_estimate(self, cond, v):
        est = HIST.estimate_cardinality(cond, v)
        s = sliced(HIST, cond, v)
        total = s.total_count() if s is not None else 0.0
        assert total == approx(est, abs=1e-4)

    @pytest.mark.parametrize("v,v2", [(2, 20), (3, 24), (26, 27), (21, 105)])
    def test_between_total(self, v, v2):
        est = HIST.estimate_cardinality("between", v, v2)
        s = sliced(HIST, "between", v, v2)
        total = s.total_count() if s is not None else 0.0
        assert total == approx(est, abs=1e-4)

    def test_property_random_cuts(self):
        @settings(max_examples=200, deadline=None)
        @given(
            v=st.integers(min_value=-10, max_value=120),
            cond=st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
        )
        def check(v, cond):
            est = HIST.estimate_cardinality(cond, v)
            s = sliced(HIST, cond, v)
            total = s.total_count() if s is not None else 0.0
            assert total == approx(est, abs=1e-4)

        check()


class TestSlicedBounds:
    def test_less_than_trims_upper(self):
        s = sliced(HIST, "<", 40)
        assert s.maxima[-1] == 39
        assert s.minima[0] == 2

    def test_greater_equals_trims_lower(self):
        s = sliced(HIST, ">=", 40)
        assert s.minima[0] == 40
        assert s.maxima[-1] == 105

    def test_equals_single_bin(self):
        s = sliced(HIST, "=", 22)
        assert (s.minima, s.maxima) == ([22], [22])
        assert s.distinct_counts == [1.0]

    def test_not_equals_splits_edge(self):
        # != 21 trims the [21, 25] bin to [22, 25]
        s = sliced(HIST, "!=", 21)
        assert 22 in s.minima
        assert s.total_count() == approx(HIST.estimate_cardinality("!=", 21))

    def test_gap_value(self):
        s = sliced(HIST, "<", 30)  # 26..36 is a gap
        assert s.maxima[-1] == 25
        s2 = sliced(HIST, ">=", 30)
        assert s2.minima[0] == 37

    def test_no_match_returns_none(self):
        assert sliced(HIST, "<", 2) is None
        assert sliced(HIST, "=", 30) is None
        assert sliced(HIST, ">", 105) is None


class TestApplyScan:
    def test_row_count_and_trimmed_histogram(self, spark, sf_tiny):
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        stats = analyze_table(orders, ["o_totalprice", "o_custkey"], max_bins=16)
        hist = stats.column_statistics["o_totalprice"].histogram
        cut = hist.maxima[7]
        out = apply_scan(stats, "o_totalprice", "<=", cut)
        true = orders.where(f"o_totalprice <= {cut}").count()
        assert out.row_count == approx(true, rel=1e-6)
        assert out.column_statistics["o_totalprice"].histogram.maxima[-1] <= cut
        # other columns scaled, not sliced
        ck = out.column_statistics["o_custkey"].histogram
        assert ck.total_count() == approx(out.row_count, rel=1e-6)

    def test_null_predicates(self, spark):
        df = spark.createDataFrame(
            [(i, i if i % 3 else None) for i in range(90)], "k bigint, v int"
        )
        stats = analyze_table(df, max_bins=8)
        nn = apply_scan(stats, "v", "is not null")
        assert nn.row_count == approx(60.0)
        assert nn.column_statistics["v"].null_value_ratio == 0.0
        nl = apply_scan(stats, "v", "is null")
        assert nl.row_count == approx(30.0)
        assert nl.column_statistics["v"].histogram is None
        assert nl.column_statistics["v"].null_value_ratio == 1.0

    def test_filter_then_join_pipeline(self, spark, sf_tiny):
        """Q3-shaped estimate: filter orders on price, join to lineitem —
        the full reference pipeline (scan stats -> join estimation)."""
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        li = spark.read.parquet(f"{sf_tiny}/lineitem.parquet")
        so = analyze_table(orders, ["o_orderkey", "o_totalprice"], max_bins=16)
        sl = analyze_table(li, ["l_orderkey"], max_bins=16)
        hist = so.column_statistics["o_totalprice"].histogram
        cut = hist.maxima[7]
        filtered = apply_scan(so, "o_totalprice", "<=", cut)
        est = join_table_statistics(filtered, sl, "o_orderkey", "l_orderkey")
        true = (
            orders.where(f"o_totalprice <= {cut}")
            .join(li, orders.o_orderkey == li.l_orderkey)
            .count()
        )
        # independence assumption + scaled-histogram join: generous bound
        assert est.row_count == approx(true, rel=0.25)

    def test_chained_conjunction(self, spark, sf_tiny):
        orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        stats = analyze_table(
            orders, ["o_totalprice", "o_custkey", "o_orderstatus"], max_bins=16
        )
        h = stats.column_statistics["o_totalprice"].histogram
        cut = h.maxima[7]
        step1 = apply_scan(stats, "o_totalprice", "<=", cut)
        step2 = apply_scan(step1, "o_orderstatus", "=", "O")
        true = orders.where(
            f"o_totalprice <= {cut} AND o_orderstatus = 'O'"
        ).count()
        # independence-assumed conjunction; status is weakly correlated
        assert step2.row_count == approx(true, rel=0.35)
