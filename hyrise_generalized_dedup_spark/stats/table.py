"""Table-level statistics: the reference's TableStatistics / ANALYZE path.

Reference:
- `src/lib/statistics/table_statistics.cpp:17-70` (from_table: per-column
  EqualDistinctCountHistogram with bin count min(100, max(5, rows/2000)),
  null-value ratio derived from the histogram total — all-null columns get
  ratio 1.0 and no histogram),
- `statistics/attribute_statistics.hpp` (histogram + null ratio bundle),
- `cardinality_estimator.cpp:548-776` (estimate_operator_scan_predicate:
  IS (NOT) NULL via the null ratio, ColumnVsValue via the histogram
  estimate, LIKE / placeholder selectivities 0.1/0.5/0.9, ColumnVsColumn
  equi scans via min-height unified bins),
- `cardinality_estimator.hpp:86-130`
  (estimate_column_vs_column_equi_scan_with_histograms).

`analyze_table` runs one distributed EDC build per requested column (each
bounded by its distinct count, never collecting data rows); everything
downstream is driver-side math over the bounded histogram objects.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from .estimator import (
    _builder_to_histogram,
    bin_bounds,
    estimate_inner_equi_join,
    estimate_semi_join,
    scaled,
    sliced,
    split_at_bin_bounds,
)
from .histogram import EqualDistinctCountHistogram, GenericHistogram

# `cardinality_estimator.cpp:46-49`
PLACEHOLDER_SELECTIVITY_LOW = 0.1
PLACEHOLDER_SELECTIVITY_MEDIUM = 0.5
PLACEHOLDER_SELECTIVITY_HIGH = 0.9
PLACEHOLDER_SELECTIVITY_ALL = 1.0


@dataclass
class AttributeStatistics:
    """Per-column statistics bundle (`attribute_statistics.hpp`)."""

    histogram: GenericHistogram | None
    null_value_ratio: float


@dataclass
class TableStatistics:
    """`table_statistics.hpp`: row count + per-column AttributeStatistics
    (keyed by column name — Spark plans address columns by name)."""

    row_count: float
    column_statistics: dict[str, AttributeStatistics]


def histogram_bin_count_for(row_count: int) -> int:
    """`table_statistics.cpp:24`: 5 bins for <=2k rows up to 100 bins for
    >=200k*1000 rows."""
    return min(100, max(5, row_count // 2_000))


def analyze_table(
    df: DataFrame, columns: list[str] | None = None, max_bins: int | None = None
) -> TableStatistics:
    """TableStatistics::from_table analog: one distributed histogram build
    per column; null ratios derived from histogram totals, never a second
    scan (`table_statistics.cpp:48-59`)."""
    row_count = df.count()
    bins = max_bins if max_bins is not None else histogram_bin_count_for(row_count)
    columns = columns if columns is not None else df.columns
    supported = ("tinyint", "smallint", "int", "bigint", "float", "double", "string")
    stats: dict[str, AttributeStatistics] = {}
    skipped: list[str] = []
    for col in columns:
        t = df.schema[col].dataType.simpleString()
        if not (t in supported or t.startswith("decimal")):
            # The reference's histogram domains are int/float/string
            # (`resolve_type.hpp`); other Spark types (timestamps, arrays)
            # get a null ratio only, from one batched agg below.
            skipped.append(col)
            continue
        hist = EqualDistinctCountHistogram.from_dataframe(df, col, bins)
        if hist is not None:
            null_ratio = (
                0.0 if row_count == 0 else 1.0 - hist.total_count() / row_count
            )
        else:
            null_ratio = 1.0  # all-null column (`table_statistics.cpp:57-59`)
        stats[col] = AttributeStatistics(hist, null_ratio)
    if skipped:
        import pyspark.sql.functions as F

        counts = df.agg(
            *[F.count(F.col(c)).alias(c) for c in skipped]
        ).collect()[0]
        for col in skipped:
            ratio = 0.0 if row_count == 0 else 1.0 - counts[col] / row_count
            stats[col] = AttributeStatistics(None, ratio)
    return TableStatistics(float(row_count), stats)


def estimate_column_vs_column_equi_scan(
    left: GenericHistogram, right: GenericHistogram
) -> GenericHistogram | None:
    """`cardinality_estimator.hpp:86-130`: conservative upper bound —
    min height / min distinct per unified bin pair."""
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
        height = min(uleft.heights[li], uright.heights[ri])
        distinct = min(uleft.distinct_counts[li], uright.distinct_counts[ri])
        if height > 0 and distinct > 0:
            bins.append((lmin, uleft.maxima[li], height, distinct))
        li += 1
        ri += 1
    return _builder_to_histogram(bins, left.kind)


def estimate_scan_selectivity(
    table: TableStatistics,
    column: str,
    cond: str,
    value=None,
    value2=None,
    other_column: str | None = None,
) -> float:
    """Selectivity of `column <cond> value` / `column = other_column`
    (`cardinality_estimator.cpp:548-776`). Conditions: = != < <= > >=
    between like 'not like' 'is null' 'is not null'."""
    col_stats = table.column_statistics[column]

    if cond in ("is null", "is not null"):
        ratio = col_stats.null_value_ratio
        return 1.0 - ratio if cond == "is not null" else ratio

    hist = col_stats.histogram
    if hist is None:
        if col_stats.null_value_ratio >= 1.0:
            # All-null column: every value predicate filters everything.
            return 0.0
        # Histogram-less type (e.g. timestamp): no estimate available.
        return PLACEHOLDER_SELECTIVITY_ALL

    if other_column is not None:
        other = table.column_statistics[other_column].histogram
        if (
            other is None
            or hist.kind == "str"
            or other.kind == "str"
            or hist.kind != other.kind
            or cond != "="
        ):
            return PLACEHOLDER_SELECTIVITY_ALL
        scanned = estimate_column_vs_column_equi_scan(hist, other)
        if scanned is None:
            return 0.0
        return 0.0 if table.row_count == 0 else scanned.total_count() / table.row_count

    if value is None:
        return 0.0  # `<column> <cond> NULL` selects nothing
    if cond == "like":
        return PLACEHOLDER_SELECTIVITY_LOW
    if cond == "not like":
        return PLACEHOLDER_SELECTIVITY_HIGH

    # ColumnVsValue: the sliced histogram's total equals the cardinality
    # estimate for every supported condition (`abstract_histogram.cpp`
    # sliced() builds bins whose heights sum to exactly that estimate), so
    # the estimate IS the sliced total without materializing the object.
    cardinality = hist.estimate_cardinality(cond, value, value2)
    return 0.0 if table.row_count == 0 else cardinality / table.row_count


def estimate_scan_cardinality(
    table: TableStatistics, column: str, cond: str, value=None, value2=None,
    other_column: str | None = None,
) -> float:
    return table.row_count * estimate_scan_selectivity(
        table, column, cond, value, value2, other_column
    )


def apply_scan(
    table: TableStatistics,
    column: str,
    cond: str,
    value=None,
    value2=None,
) -> TableStatistics:
    """Output statistics of `WHERE column <cond> value`
    (`cardinality_estimator.cpp:548-776`): the scanned column carries the
    SLICED histogram (bounds trimmed at the value), every other column is
    scaled by the selectivity, the row count shrinks accordingly. Chain
    calls to model conjunctions (the reference applies one
    OperatorScanPredicate at a time, independence-assumed)."""
    selectivity = estimate_scan_selectivity(table, column, cond, value, value2)
    out: dict[str, AttributeStatistics] = {}
    for name, stats in table.column_statistics.items():
        if name == column and cond in ("is null", "is not null"):
            # `cardinality_estimator.cpp:574-590`: the surviving side is
            # all-NULL or NULL-free respectively
            out[name] = AttributeStatistics(
                None if cond == "is null" else stats.histogram,
                1.0 if cond == "is null" else 0.0,
            )
        elif name == column and stats.histogram is not None and value is not None:
            new_hist = sliced(stats.histogram, cond, value, value2)
            # value predicates never keep NULLs of the scanned column
            out[name] = AttributeStatistics(new_hist, 0.0)
        else:
            hist = (
                scaled(stats.histogram, selectivity)
                if stats.histogram is not None
                else None
            )
            out[name] = AttributeStatistics(hist, stats.null_value_ratio)
    return TableStatistics(table.row_count * selectivity, out)


def estimate_join_cardinality(
    left: TableStatistics,
    right: TableStatistics,
    left_column: str,
    right_column: str,
    mode: str = "inner",
) -> float:
    """Equi-join output estimate between two analyzed tables
    (`cardinality_estimator.cpp:430-495`): outer modes estimate like inner
    (JoinOuter test), semi caps at the left input, cross multiplies."""
    if mode == "cross":
        return left.row_count * right.row_count
    lh = left.column_statistics[left_column].histogram
    rh = right.column_statistics[right_column].histogram
    if mode in ("inner", "left", "right", "full"):
        return estimate_inner_equi_join(lh, rh, left.row_count, right.row_count)
    if mode in ("semi", "anti"):
        semi = estimate_semi_join(lh, rh, left.row_count)
        return semi if mode == "semi" else left.row_count - semi
    raise ValueError(f"unknown join mode {mode!r}")
