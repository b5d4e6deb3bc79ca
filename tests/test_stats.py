"""Statistics subsystem tests: histogram domain, EqualDistinctCount
construction (parity with the reference's own unit-test fixtures and
expectations), the cardinality-estimation formulas (parity with
generic_histogram_test.cpp expectations), and per-file pruning filters.

Reference test vectors:
- string_histogram_domain_test.cpp (string_to_number / next_value vectors)
- equal_distinct_count_histogram_test.cpp (FromColumn{Int,Float,String})
- generic_histogram_test.cpp (EstimateCardinalityInt / BasicInt / BasicFloat)
- range_filter.cpp:70-96 (the running example in the builder comment)
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from hyrise_generalized_dedup_spark.sources.csv_tbl import read_tbl
from hyrise_generalized_dedup_spark.stats import (
    EqualDistinctCountHistogram,
    GenericHistogram,
    MinMaxFilter,
    RangeFilter,
    StringHistogramDomain,
    edc_histogram_bins,
    file_pruning_stats,
    prune_files,
)
from hyrise_generalized_dedup_spark.stats.histogram import _bin_id_for_rank

REF_TBL = "/root/reference/resources/test_data/tbl"


# ---------------------------------------------------------------------------
# String histogram domain (string_histogram_domain_test.cpp)
# ---------------------------------------------------------------------------


class TestStringDomain:
    dom = StringHistogramDomain("a", "z", 4)

    @pytest.mark.parametrize(
        "value,expected",
        [
            ("", 0),
            ("a", 1),
            ("aa", 2),
            ("aaaa", 4),
            ("aaab", 5),
            ("azzz", 18_279),
            ("b", 18_280),
            ("ba", 18_281),
            ("bhja", 23_447),
            ("cde", 38_778),
            ("zzzz", 475_254),
            ("A", 1),  # out-of-domain chars clamp to min_char
            ("aaaaa", 5),  # longer than prefix -> +1
            ("aaaaaa", 5),
            ("aaaab", 5),
        ],
    )
    def test_string_to_number(self, value, expected):
        assert self.dom.string_to_number(value) == expected

    @pytest.mark.parametrize(
        "value,expected",
        [
            ("", "a"),
            ("a", "aa"),
            ("ayz", "ayza"),
            ("ayzz", "az"),
            ("azzz", "b"),
            ("z", "za"),
            ("df", "dfa"),
            ("abcd", "abce"),
            ("abaz", "abb"),
            ("abzz", "ac"),
            ("abca", "abcb"),
            ("abaa", "abab"),
            ("aaaaa", "aaab"),
            ("zzzz", "zzzz"),  # clamped at the domain maximum
        ],
    )
    def test_next_value_clamped(self, value, expected):
        assert self.dom.next_value_clamped(value) == expected

    def test_next_value_rejects_out_of_domain(self):
        with pytest.raises(ValueError):
            self.dom.next_value_clamped("A")

    def test_string_to_domain_clamps(self):
        assert self.dom.string_to_domain("ABCDA") == "aaaaa"
        assert self.dom.string_to_domain("abcda") == "abcda"

    def test_order_preserving(self):
        vals = ["", "a", "ab", "abc", "b", "ba", "zz", "zzzz"]
        nums = [self.dom.string_to_number(v) for v in vals]
        assert nums == sorted(nums)


# ---------------------------------------------------------------------------
# Construction parity with the reference's own fixtures
# (equal_distinct_count_histogram_test.cpp)
# ---------------------------------------------------------------------------


class TestFromColumnParity:
    def test_from_column_int(self, spark):
        df = read_tbl(spark, f"{REF_TBL}/int_float4.tbl")
        hist = EqualDistinctCountHistogram.from_dataframe(df, "a", 2)
        assert hist.bin_count() == 2
        assert (hist.minima, hist.maxima) == ([12, 12345], [123, 123456])
        assert hist.heights == [2.0, 5.0]
        assert hist.distinct_counts == [2.0, 2.0]

    def test_from_column_float(self, spark):
        df = read_tbl(spark, f"{REF_TBL}/float2.tbl")
        hist = EqualDistinctCountHistogram.from_dataframe(df, "a", 3)
        assert hist.bin_count() == 3
        assert hist.minima == pytest.approx([0.5, 2.5, 3.6])
        assert hist.maxima == pytest.approx([2.2, 3.3, 6.1])
        assert hist.heights == [4.0, 6.0, 4.0]
        assert hist.distinct_counts == [4.0, 3.0, 3.0]

    def test_from_column_string(self, spark):
        df = read_tbl(spark, f"{REF_TBL}/string2.tbl")
        hist = EqualDistinctCountHistogram.from_dataframe(df, "a", 4)
        assert hist.bin_count() == 4
        assert (hist.minima[0], hist.maxima[0], hist.heights[0]) == ("aa", "birne", 3)
        assert (hist.minima[1], hist.maxima[1], hist.heights[1]) == ("bla", "ttt", 4)
        assert (hist.minima[2], hist.maxima[2], hist.heights[2]) == ("uuu", "xxx", 4)
        assert hist.distinct_counts == [3.0, 3.0, 3.0, 2.0]

    def test_fewer_distinct_than_bins(self, spark):
        df = spark.createDataFrame([(1,), (1,), (7,)], "v int")
        hist = EqualDistinctCountHistogram.from_dataframe(df, "v", 10)
        assert hist.bin_count() == 2
        assert hist.heights == [2.0, 1.0]

    def test_all_null_returns_none(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "v int")
        assert EqualDistinctCountHistogram.from_dataframe(df, "v", 4) is None


# ---------------------------------------------------------------------------
# Distributed build: partitioning invariance + python-twin oracle
# ---------------------------------------------------------------------------


def _python_twin(pairs: list[tuple[int, int]], max_bins: int):
    """From-scratch restatement of equal_distinct_count_histogram.cpp:102-150
    over a (value, count) census."""
    pairs = sorted(pairs)
    d = len(pairs)
    bins = min(d, max_bins)
    out = {}
    for rank, (v, c) in enumerate(pairs):
        b = _bin_id_for_rank(rank, d, bins)
        lo, hi, h, dc = out.get(b, (v, v, 0, 0))
        out[b] = (min(lo, v), max(hi, v), h + c, dc + 1)
    return [
        (b, lo, hi, h, dc) for b, (lo, hi, h, dc) in sorted(out.items())
    ]


class TestDistributedBuild:
    def test_partitioning_invariance(self, spark):
        rows = [(i * i % 97,) for i in range(500)]
        df = spark.createDataFrame(rows, "v int")
        a = edc_histogram_bins(df, "v", 7).collect()
        b = edc_histogram_bins(df.repartition(13), "v", 7).collect()
        c = edc_histogram_bins(df.coalesce(1), "v", 7).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b] == [tuple(r) for r in c]

    def test_matches_python_twin(self, spark):
        @settings(max_examples=10, deadline=None)
        @given(
            values=st.lists(
                st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=120
            ),
            max_bins=st.integers(min_value=1, max_value=12),
        )
        def check(values, max_bins):
            df = spark.createDataFrame([(v,) for v in values], "v int")
            got = [
                (r.bin_id, r.bin_min, r.bin_max, r.height, r.distinct_count)
                for r in edc_histogram_bins(df, "v", max_bins).collect()
            ]
            census: dict[int, int] = {}
            for v in values:
                census[v] = census.get(v, 0) + 1
            assert got == _python_twin(list(census.items()), max_bins)

        check()

    def test_invariants_on_real_table(self, spark, sf_tiny):
        df = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        bins = edc_histogram_bins(df, "o_custkey", 8).collect()
        truth = df.where("o_custkey IS NOT NULL")
        assert sum(r.height for r in bins) == truth.count()
        assert sum(r.distinct_count for r in bins) == (
            truth.select("o_custkey").distinct().count()
        )
        for prev, cur in zip(bins, bins[1:]):
            assert prev.bin_max < cur.bin_min  # sorted, disjoint
        dcs = {r.distinct_count for r in bins}
        assert len(dcs) <= 2 and max(dcs) - min(dcs) <= 1  # EDC invariant


# ---------------------------------------------------------------------------
# Estimation parity (generic_histogram_test.cpp EstimateCardinalityInt)
# ---------------------------------------------------------------------------


class TestEstimateCardinalityInt:
    hist = GenericHistogram(
        [2, 21, 37, 101, 105],
        [20, 25, 100, 103, 105],
        [17, 30, 40, 1, 5],
        [5, 3, 27, 1, 1],
        kind="int",
    )
    zeros = GenericHistogram(
        [2, 21, 37], [20, 25, 100], [0.0, 6.0, 0.0], [5.0, 0.0, 0.0], kind="int"
    )
    total = 93.0  # 17+30+40+1+5

    def est(self, cond, v, v2=None, hist=None):
        return (hist or self.hist).estimate_cardinality(cond, v, v2)

    def test_equals(self):
        approx = pytest.approx
        assert self.est("=", 1) == 0.0
        assert self.est("=", 3) == approx(17.0 / 5.0)
        assert self.est("=", 26) == 0.0
        assert self.est("=", 105) == approx(5.0)
        assert self.est("=", 200) == 0.0
        assert self.est("=", 2, hist=self.zeros) == 0.0
        assert self.est("=", 21, hist=self.zeros) == 0.0
        assert self.est("=", 37, hist=self.zeros) == 0.0

    def test_not_equals(self):
        approx = pytest.approx
        assert self.est("!=", 1) == approx(self.total)
        assert self.est("!=", 21) == approx(self.total - 10.0)
        assert self.est("!=", 2, hist=self.zeros) == approx(6.0)
        assert self.est("!=", 21, hist=self.zeros) == approx(6.0)
        assert self.est("!=", 37, hist=self.zeros) == approx(6.0)

    def test_less_than(self):
        approx = pytest.approx
        assert self.est("<", -10) == 0.0
        assert self.est("<", 2) == 0.0
        assert self.est("<", 20) == approx(17.0 - 17.0 / 19.0)
        assert self.est("<", 21) == approx(17.0)
        assert self.est("<", 40) == approx(17.0 + 30 + 3 * (40.0 / 64.0))
        assert self.est("<", 105) == approx(self.total - 5.0)
        assert self.est("<", 1000) == approx(self.total)

    def test_less_than_equals(self):
        approx = pytest.approx
        assert self.est("<=", -10) == 0.0
        assert self.est("<=", 2) == approx(17.0 / 19.0)
        assert self.est("<=", 3) == approx(2 * (17.0 / 19.0))
        assert self.est("<=", 20) == approx(17.0)
        assert self.est("<=", 21) == approx(17.0 + 30.0 / 5.0)
        assert self.est("<=", 40) == approx(17.0 + 30 + 4 * (40.0 / 64.0))
        assert self.est("<=", 105) == approx(self.total)
        assert self.est("<=", 1000) == approx(self.total)

    def test_greater_than(self):
        approx = pytest.approx
        assert self.est(">", -10) == approx(self.total)
        assert self.est(">", 1) == approx(self.total)
        assert self.est(">", 2) == approx(self.total - 17.0 / 19.0)
        assert self.est(">", 20) == approx(76.0)
        assert self.est(">", 21) == approx(76.0 - 30.0 / 5.0)
        assert self.est(">", 105) == 0.0
        assert self.est(">", 1000) == 0.0

    def test_greater_than_equals(self):
        approx = pytest.approx
        assert self.est(">=", -10) == approx(self.total)
        assert self.est(">=", 1) == approx(self.total)
        assert self.est(">=", 2) == approx(self.total)
        assert self.est(">=", 20) == approx(76.0 + 17.0 / 19.0)
        assert self.est(">=", 21) == approx(76.0)
        assert self.est(">=", 105) == approx(5.0)
        assert self.est(">=", 1000) == 0.0

    def test_between(self):
        approx = pytest.approx
        assert self.est("between", 2, 20) == approx(17.0)
        assert self.est("between", 2, 25) == approx(47.0)
        assert self.est("between", 26, 27) == 0.0
        assert self.est("between", 105, 105) == approx(5.0)
        assert self.est("between", 105, 106) == approx(5.0)
        assert self.est("between", 107, 107) == 0.0

    def test_distinct_counts(self):
        card, distinct = self.hist.estimate_cardinality_and_distinct_count("=", 3)
        assert distinct == 1.0
        card, distinct = self.hist.estimate_cardinality_and_distinct_count("<", 21)
        assert distinct == pytest.approx(5.0)

    def test_float_equals(self):
        # EstimateCardinalityAndPruningBasicFloat: bin [0.5, 2.2] h=4 d=4
        hist = GenericHistogram(
            [0.5, 2.5, 3.6],
            [2.2, 3.3, 6.1],
            [4, 6, 4],
            [4, 3, 3],
            kind="float",
        )
        assert hist.estimate_cardinality("=", 0.4) == 0.0
        assert hist.estimate_cardinality("=", 0.5) == pytest.approx(1.0)
        assert hist.estimate_cardinality("<", 0.5) == 0.0
        assert hist.estimate_cardinality("<", 6.2) == pytest.approx(14.0)

    def test_like_returns_total(self):
        dom = StringHistogramDomain()
        hist = GenericHistogram(
            ["aa", "bla"], ["birne", "ttt"], [3, 4], [3, 3], kind="str", domain=dom
        )
        assert hist.estimate_cardinality("like", "b%") == pytest.approx(7.0)

    def test_string_estimates_monotone(self):
        dom = StringHistogramDomain()
        hist = GenericHistogram(
            ["aa", "bla", "uuu"],
            ["birne", "ttt", "zzz"],
            [3, 4, 5],
            [3, 3, 3],
            kind="str",
            domain=dom,
        )
        probes = ["a", "ab", "bir", "bla", "c", "t", "v", "zzz"]
        ests = [hist.estimate_cardinality("<", p) for p in probes]
        assert ests == sorted(ests)
        assert hist.estimate_cardinality("<", "{") == pytest.approx(12.0)
        card, _ = hist.estimate_cardinality_and_distinct_count("=", "bla")
        assert card == pytest.approx(4.0 / 3.0)


# ---------------------------------------------------------------------------
# Pruning filters (min_max_filter.cpp / range_filter.cpp)
# ---------------------------------------------------------------------------


class TestPruningFilters:
    def test_range_filter_build_running_example(self):
        # range_filter.cpp:70-96 running example
        rf = RangeFilter.build([2, 3, 5, 8, 9, 11], 3)
        assert rf.ranges == ((2, 3), (5, 5), (8, 11))

    def test_range_filter_build_edges(self):
        assert RangeFilter.build([], 3) is None
        assert RangeFilter.build([7], 3).ranges == ((7, 7),)
        assert RangeFilter.build([1, 9], 1).ranges == ((1, 9),)
        rf = RangeFilter.build([1, 2, 3], 10)  # more ranges than gaps
        assert rf.ranges == ((1, 1), (2, 2), (3, 3))

    def test_min_max_filter(self):
        f = MinMaxFilter(7, 10)
        assert f.does_not_contain(">", 10)
        assert not f.does_not_contain(">", 9)
        assert f.does_not_contain(">=", 11)
        assert f.does_not_contain("<", 7)
        assert f.does_not_contain("<=", 6)
        assert f.does_not_contain("=", 6) and f.does_not_contain("=", 11)
        assert not f.does_not_contain("=", 7)
        # between examples from min_max_filter.cpp:131-139
        assert not f.does_not_contain("between", 5, 7)
        assert f.does_not_contain("between", 5, 6)
        assert not f.does_not_contain("between", 10, 12)
        assert f.does_not_contain("between", 11, 12)
        assert not f.does_not_contain("=", None)

    def test_range_filter_does_not_contain(self):
        rf = RangeFilter(((2, 3), (5, 5), (8, 11)))
        assert rf.does_not_contain("=", 4)
        assert rf.does_not_contain("=", 7)
        assert not rf.does_not_contain("=", 5)
        assert not rf.does_not_contain("=", 9)
        assert rf.does_not_contain("<", 2)
        assert rf.does_not_contain(">", 11)
        assert rf.does_not_contain("between", 6, 7)  # inside the 5..8 gap
        assert not rf.does_not_contain("between", 6, 9)
        assert not rf.does_not_contain("between", 3, 4)  # 3 overlaps a range
        assert rf.does_not_contain("between", 12, 15)
        assert rf.does_not_contain("!", 99) is False  # unknown cond -> keep


# ---------------------------------------------------------------------------
# Distributed per-file pruning stats
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pruned_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("prune")
    files = {
        "f0.parquet": [1, 2, 3, 9, 10, None],
        "f1.parquet": [50, 51, 52, 90, 100],
        "f2.parquet": [None, None],
        "f3.parquet": [7, 7, 7],
    }
    for name, vals in files.items():
        pq.write_table(
            pa.table({"v": pa.array(vals, type=pa.int64())}), str(root / name)
        )
    return str(root), files


class TestFilePruningStats:
    def test_stats_match_duckdb(self, spark, pruned_dir):
        root, _files = pruned_dir
        df = spark.read.parquet(root)
        got = {
            r.file.rsplit("/", 1)[-1]: r
            for r in file_pruning_stats(df, "v", max_ranges=3).collect()
        }
        want = {
            row[0].rsplit("/", 1)[-1]: row
            for row in duckdb.sql(
                f"""
                SELECT filename, COUNT(*),
                       COUNT(*) - COUNT(v), MIN(v), MAX(v)
                FROM read_parquet('{root}/*.parquet', filename=true)
                GROUP BY filename
                """
            ).fetchall()
        }
        assert set(got) == set(want)
        for name, row in want.items():
            r = got[name]
            assert (r.n_rows, r.n_nulls, r.vmin, r.vmax) == row[1:]

    def test_ranges_match_builder(self, spark, pruned_dir):
        root, files = pruned_dir
        df = spark.read.parquet(root)
        got = {
            r.file.rsplit("/", 1)[-1]: r
            for r in file_pruning_stats(df, "v", max_ranges=3).collect()
        }
        for name, vals in files.items():
            uniq = sorted({v for v in vals if v is not None})
            rf = RangeFilter.build(uniq, 3)
            r = got[name]
            if rf is None:
                assert r.range_lo == [] and r.range_hi == []
            else:
                assert tuple(zip(r.range_lo, r.range_hi)) == rf.ranges

    @pytest.mark.parametrize(
        "cond,v,v2",
        [
            ("=", 5, None),  # inside f0's 3..9 gap -> gap-aware prune
            ("=", 60, None),
            ("=", 7, None),
            ("<", 2, None),
            (">", 52, None),
            ("between", 11, 49),
            ("between", 4, 8),
        ],
    )
    def test_prune_soundness(self, spark, pruned_dir, cond, v, v2):
        root, files = pruned_dir
        df = spark.read.parquet(root)
        stats = file_pruning_stats(df, "v", max_ranges=3)
        decisions = {
            r.file.rsplit("/", 1)[-1]: r.prunable
            for r in prune_files(stats, cond, v, v2).collect()
        }
        for name, vals in files.items():
            nn = [x for x in vals if x is not None]
            if cond == "=":
                matches = any(x == v for x in nn)
            elif cond == "<":
                matches = any(x < v for x in nn)
            elif cond == ">":
                matches = any(x > v for x in nn)
            else:
                matches = any(v <= x <= v2 for x in nn)
            if decisions[name]:
                assert not matches, f"{name} pruned but contains matches"

    def test_gap_prune_beats_minmax(self, spark, pruned_dir):
        """`= 5` falls inside f0's [3, 9] gap: min/max alone keeps the
        file, the RangeFilter prunes it — the capability parquet row-group
        stats cannot express."""
        root, _ = pruned_dir
        df = spark.read.parquet(root)
        stats = file_pruning_stats(df, "v", max_ranges=3)
        decisions = {
            r.file.rsplit("/", 1)[-1]: r.prunable
            for r in prune_files(stats, "=", 5).collect()
        }
        assert decisions["f0.parquet"] is True
        assert decisions["f1.parquet"] is True  # below min
        assert decisions["f2.parquet"] is False  # all-null: no filter built
        assert decisions["f3.parquet"] is True

    def test_all_null_never_pruned(self, spark, pruned_dir):
        root, _ = pruned_dir
        df = spark.read.parquet(root)
        stats = file_pruning_stats(df, "v", max_ranges=3)
        for cond, v in [("=", 1), ("<", 100), (">", -5)]:
            decisions = {
                r.file.rsplit("/", 1)[-1]: r.prunable
                for r in prune_files(stats, cond, v).collect()
            }
            assert decisions["f2.parquet"] is False


# ---------------------------------------------------------------------------
# Estimator sanity against true selectivities on a real table
# ---------------------------------------------------------------------------


class TestEstimatorOnRealData:
    def test_estimates_bounded_and_ordered(self, spark, sf_tiny):
        df = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        hist = EqualDistinctCountHistogram.from_dataframe(df, "o_totalprice", 16)
        total = df.where("o_totalprice IS NOT NULL").count()
        assert hist.total_count() == total
        lo, hi = hist.minima[0], hist.maxima[-1]
        assert hist.estimate_cardinality("<=", hi) == pytest.approx(total)
        assert hist.estimate_cardinality("<", lo) == 0.0
        mid = (lo + hi) / 2
        est = hist.estimate_cardinality("<", mid)
        true = df.where(f"o_totalprice < {mid}").count()
        # EDC histograms bound the error by the bin heights around the cut
        assert abs(est - true) <= max(hist.heights) + 1

    def test_equals_error_bounded_by_bin(self, spark, sf_tiny):
        df = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        hist = EqualDistinctCountHistogram.from_dataframe(df, "o_custkey", 8)
        some_key = df.select("o_custkey").first()[0]
        est = hist.estimate_cardinality("=", some_key)
        true = df.where(f"o_custkey = {some_key}").count()
        b = hist._bin_for_value(some_key)
        assert abs(est - true) <= hist.heights[b]


class TestPlanShape:
    """100 TB lens: the census scan must prune to the one column and
    partial-aggregate map-side; the returned bins are a driver-local
    relation (bin-count-bounded), not a live plan over the corpus."""

    def test_census_scan_pruned_and_partial(self, spark, sf_tiny):
        import pyspark.sql.functions as F

        df = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        census = (
            df.where(F.col("o_custkey").isNotNull())
            .groupBy(F.col("o_custkey").alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        census.collect()
        plan = census._jdf.queryExecution().executedPlan().toString()
        # column-pruned scan: ReadSchema carries only o_custkey
        read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read_schema and "o_custkey" in read_schema[0]
        assert "o_totalprice" not in read_schema[0]
        # map-side partial agg + final agg
        assert plan.count("HashAggregate") >= 2

    def test_result_is_local_relation(self, spark, sf_tiny):
        df = spark.read.parquet(f"{sf_tiny}/orders.parquet")
        bins = edc_histogram_bins(df, "o_custkey", 8)
        plan = bins._jdf.queryExecution().executedPlan().toString()
        assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
        assert bins.count() <= 8


def test_bin_id_for_rank_exhaustive():
    for d in range(1, 40):
        for b in range(1, d + 1):
            ids = [_bin_id_for_rank(r, d, b) for r in range(d)]
            assert ids == sorted(ids)
            assert ids[0] == 0 and ids[-1] == b - 1
            from collections import Counter

            sizes = Counter(ids)
            dpb, extra = d // b, d % b
            for i in range(b):
                assert sizes[i] == dpb + (1 if i < extra else 0)
