"""Join cardinality estimation over histograms — the reference's
CardinalityEstimator join path.

Reference:
- `src/lib/statistics/cardinality_estimator.cpp:778-976`
  (estimate_inner_equi_join / estimate_semi_join / estimate_cross_join,
  estimate_inner_equi_join_of_bins principle-of-inclusion),
- `cardinality_estimator.hpp:157-210`
  (estimate_inner_equi_join_with_histograms bin alignment),
- `statistics_objects/abstract_histogram.cpp:735-860`
  (split_at_bin_bounds, bin_bounds, scaled, _scale_distinct_count).

All of this is driver-side pure Python over bin-count-bounded histogram
objects — exactly the reference's split between stored statistics and the
estimator that reads them. The histograms themselves come from the
distributed EDC build (`histogram.edc_histogram_bins`), so at 100 TB the
only cost of estimating a join is two bounded histogram builds.

Semantics verified against the reference's own unit-test expectations
(`src/test/lib/statistics/cardinality_estimator_test.cpp:304-372`,
`statistics_objects/generic_histogram_test.cpp:1085-1155`) in
tests/test_stats_estimator.py, plus accuracy checks against true Spark
join counts on the TPC-H testdata.
"""

from __future__ import annotations

import math

from .domain import next_value_clamped, previous_value_clamped
from .histogram import INVALID_BIN, GenericHistogram


def _builder_to_histogram(
    bins: list[tuple[object, object, float, float]], kind: str
) -> GenericHistogram | None:
    """GenericHistogramBuilder analog: assemble non-empty bins, None when
    the builder stays empty (`generic_histogram_builder.cpp`)."""
    if not bins:
        return None
    return GenericHistogram(
        [b[0] for b in bins],
        [b[1] for b in bins],
        [b[2] for b in bins],
        [b[3] for b in bins],
        kind=kind,
    )


def scale_distinct_count(value_count: float, distinct_count: float, selectivity: float) -> float:
    """`abstract_histogram.cpp:879-882`."""
    return min(distinct_count, value_count * selectivity)


def scaled(hist: GenericHistogram, selectivity: float) -> GenericHistogram | None:
    """`abstract_histogram.cpp:735-748` — scale heights, cap distincts."""
    if math.isnan(selectivity):
        raise ValueError("unexpected selectivity")
    bins = [
        (
            hist.minima[i],
            hist.maxima[i],
            hist.heights[i] * selectivity,
            scale_distinct_count(hist.heights[i], hist.distinct_counts[i], selectivity),
        )
        for i in range(hist.bin_count())
    ]
    return _builder_to_histogram(bins, hist.kind)


def bin_bounds(hist: GenericHistogram) -> list[tuple[object, object]]:
    """`abstract_histogram.cpp:851-860`."""
    return list(zip(hist.minima, hist.maxima))


def split_at_bin_bounds(
    hist: GenericHistogram, additional_bin_edges: list[tuple[object, object]]
) -> GenericHistogram | None:
    """`abstract_histogram.cpp:749-848` — re-bin so that every edge of the
    histogram AND of `additional_bin_edges` is a bin boundary; per-bin
    height/distinct come from the between-estimate over the original bins.
    Numeric domains only (the reference Fails on strings)."""
    if hist.kind == "str":
        raise ValueError("cannot split_at_bin_bounds() on string histogram")
    splits: set[tuple[object, object]] = set()
    for lo, hi in bin_bounds(hist):
        splits.add((previous_value_clamped(lo, hist.kind), lo))
        splits.add((hi, next_value_clamped(hi, hist.kind)))
    for lo, hi in additional_bin_edges:
        splits.add((previous_value_clamped(lo, hist.kind), lo))
        splits.add((hi, next_value_clamped(hi, hist.kind)))
    if not splits:
        return None
    edges: list = []
    for a, b in splits:
        edges.append(a)
        edges.append(b)
    edges.sort()
    edges = edges[1:-1]
    bins = []
    for i in range(len(edges) // 2):
        lo, hi = edges[2 * i], edges[2 * i + 1]
        card, distinct = hist.estimate_cardinality_and_distinct_count("between", lo, hi)
        if card == 0:
            continue
        bins.append((lo, hi, card, distinct))
    return _builder_to_histogram(bins, hist.kind)


def sliced(
    hist: GenericHistogram, cond: str, v, v2=None
) -> GenericHistogram | None:
    """`abstract_histogram.cpp` sliced(): restrict the histogram to the
    value range a predicate admits — bin bounds trimmed at the value,
    heights/distincts scaled by the sliced bin ratio. None when the
    predicate matches nothing. The sliced total equals
    estimate_cardinality for every supported condition."""
    if hist.kind == "str" and isinstance(v, str):
        v = hist.domain.string_to_domain(v)
    if hist.does_not_contain(cond, v, v2):
        return None

    def _slice_bin(b: int, lo, hi) -> tuple:
        ratio = hist.bin_ratio_less_than_equals(b, hi) - hist.bin_ratio_less_than(
            b, lo
        )
        return (lo, hi, hist.heights[b] * ratio, hist.distinct_counts[b] * ratio)

    if cond == "=":
        card = hist.estimate_cardinality("=", v)
        return _builder_to_histogram([(v, v, card, 1.0)], hist.kind)

    if cond == "!=":
        b = hist._bin_for_value(v)
        if b == INVALID_BIN:
            return GenericHistogram(
                list(hist.minima), list(hist.maxima), list(hist.heights),
                list(hist.distinct_counts), kind=hist.kind, domain=hist.domain,
            )
        bins = [
            (hist.minima[i], hist.maxima[i], hist.heights[i], hist.distinct_counts[i])
            for i in range(b)
        ]
        lo, hi = hist.minima[b], hist.maxima[b]
        if lo != hi:
            if hist.kind != "str":
                if lo == v:
                    lo = next_value_clamped(v, hist.kind)
                if hi == v:
                    hi = previous_value_clamped(v, hist.kind)
            card, distinct = hist.estimate_cardinality_and_distinct_count("=", v)
            bins.append(
                (lo, hi, hist.heights[b] - card, hist.distinct_counts[b] - distinct)
            )
        bins.extend(
            (hist.minima[i], hist.maxima[i], hist.heights[i], hist.distinct_counts[i])
            for i in range(b + 1, hist.bin_count())
        )
        return _builder_to_histogram(bins, hist.kind)

    if cond == "<=":
        return sliced(hist, "<", next_value_clamped(v, hist.kind, hist.domain))

    if cond == "<":
        last = hist._bin_for_value(v)
        if last == INVALID_BIN:
            nxt = hist._next_bin_for_value(v)
            last = hist.bin_count() - 1 if nxt == INVALID_BIN else nxt - 1
        elif v == hist.minima[last]:
            last -= 1
        if hist.kind != "str":
            last_max = min(hist.maxima[last], previous_value_clamped(v, hist.kind))
        else:
            last_max = min(hist.maxima[last], v)
        bins = [
            (hist.minima[i], hist.maxima[i], hist.heights[i], hist.distinct_counts[i])
            for i in range(last)
        ]
        bins.append(_slice_bin(last, hist.minima[last], last_max))
        return _builder_to_histogram(bins, hist.kind)

    if cond == ">":
        return sliced(hist, ">=", next_value_clamped(v, hist.kind, hist.domain))

    if cond == ">=":
        first = hist._bin_for_value(v)
        if first == INVALID_BIN:
            first = hist._next_bin_for_value(v)
        bins = [_slice_bin(first, max(v, hist.minima[first]), hist.maxima[first])]
        bins.extend(
            (hist.minima[i], hist.maxima[i], hist.heights[i], hist.distinct_counts[i])
            for i in range(first + 1, hist.bin_count())
        )
        return _builder_to_histogram(bins, hist.kind)

    if cond == "between":
        if v2 is None:
            raise ValueError("between needs two values")
        lower = sliced(hist, ">=", v)
        return sliced(lower, "<=", v2) if lower is not None else None

    if cond in ("like", "not like"):
        return GenericHistogram(
            list(hist.minima), list(hist.maxima), list(hist.heights),
            list(hist.distinct_counts), kind=hist.kind, domain=hist.domain,
        )

    raise ValueError(f"predicate not supported by sliced(): {cond!r}")


def estimate_inner_equi_join_of_bins(
    left_height: float,
    left_distinct: float,
    right_height: float,
    right_distinct: float,
) -> tuple[float, float]:
    """Principle-of-inclusion estimate for two bins with equal bounds
    (`cardinality_estimator.cpp:939-969`): every distinct value of the
    side with FEWER distincts is assumed to find matches on the other."""
    if left_distinct < right_distinct:
        return estimate_inner_equi_join_of_bins(
            right_height, right_distinct, left_height, left_distinct
        )
    if left_distinct == 0 or right_distinct == 0:
        return (0.0, 0.0)
    right_density = right_height / right_distinct
    left_match_ratio = right_distinct / left_distinct
    return (left_height * left_match_ratio * right_density, right_distinct)


def estimate_inner_equi_join_with_histograms(
    left: GenericHistogram, right: GenericHistogram
) -> GenericHistogram | None:
    """`cardinality_estimator.hpp:157-210`: unify both histograms'
    boundaries, then estimate overlapping bins pairwise."""
    uleft = split_at_bin_bounds(left, bin_bounds(right))
    uright = split_at_bin_bounds(right, bin_bounds(left))
    if uleft is None or uright is None:
        return None
    bins = []
    li = ri = 0
    while li < uleft.bin_count() and ri < uright.bin_count():
        lmin, rmin = uleft.minima[li], uright.minima[ri]
        if lmin < rmin:
            li += 1
            continue
        if rmin < lmin:
            ri += 1
            continue
        height, distinct = estimate_inner_equi_join_of_bins(
            uleft.heights[li],
            uleft.distinct_counts[li],
            uright.heights[ri],
            uright.distinct_counts[ri],
        )
        if height > 0:
            bins.append((lmin, uleft.maxima[li], height, distinct))
        li += 1
        ri += 1
    return _builder_to_histogram(bins, left.kind)


def estimate_inner_equi_join(
    left: GenericHistogram | None,
    right: GenericHistogram | None,
    left_row_count: float,
    right_row_count: float,
) -> float:
    """Join output cardinality (`cardinality_estimator.cpp:778-818`):
    histogram inclusion when both sides carry histograms; the reference's
    cross-join fallback otherwise (strings included — the reference
    falls back for string join columns)."""
    if (
        left is None
        or right is None
        or left.kind == "str"
        or right.kind == "str"
        or left.kind != right.kind
    ):
        return left_row_count * right_row_count
    joined = estimate_inner_equi_join_with_histograms(left, right)
    return joined.total_count() if joined is not None else 0.0


def estimate_semi_join(
    left: GenericHistogram | None,
    right: GenericHistogram | None,
    left_row_count: float,
) -> float:
    """`cardinality_estimator.cpp:856-945`: collapse the right side to
    one row per distinct value, then run the inner estimation — capped at
    the left input (semi joins never grow)."""
    if (
        left is None
        or right is None
        or left.kind == "str"
        or right.kind == "str"
        or left.kind != right.kind
    ):
        return left_row_count
    distinct_right = GenericHistogram(
        list(right.minima),
        list(right.maxima),
        list(right.distinct_counts),
        list(right.distinct_counts),
        kind=right.kind,
        domain=right.domain,
    )
    joined = estimate_inner_equi_join_with_histograms(left, distinct_right)
    cardinality = joined.total_count() if joined is not None else 0.0
    return min(cardinality, left_row_count)


def estimate_cross_join(left_row_count: float, right_row_count: float) -> float:
    """`cardinality_estimator.cpp:948-976`."""
    return left_row_count * right_row_count
