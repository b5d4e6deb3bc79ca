"""Statistics subsystem: histograms, pruning filters, cardinality estimation.

PySpark-native re-expression of the reference's optimizer-statistics stack
(`src/lib/statistics/`): EqualDistinctCountHistogram / GenericHistogram
construction + estimation (`statistics_objects/equal_distinct_count_
histogram.cpp`, `abstract_histogram.cpp`), the string histogram domain
(`statistics_objects/histogram_domain.cpp`), and the per-chunk pruning
filters MinMaxFilter / RangeFilter (`statistics_objects/range_filter.cpp`,
`generate_pruning_statistics.cpp`) re-targeted at parquet files.

Construction is distributed (census groupBy + range-partitioned exact rank,
no single-partition window); estimation is a driver-side pure-Python replay
of the reference's formulas over the collected, bin-count-bounded result.
"""

from .domain import StringHistogramDomain
from .histogram import (
    EqualDistinctCountHistogram,
    GenericHistogram,
    HistogramBin,
    edc_histogram_bins,
)
from .pruning import MinMaxFilter, RangeFilter, file_pruning_stats, prune_files
from .estimator import (
    estimate_cross_join,
    estimate_inner_equi_join,
    estimate_inner_equi_join_of_bins,
    estimate_inner_equi_join_with_histograms,
    estimate_semi_join,
    scaled,
    sliced,
    split_at_bin_bounds,
)
from .table import (
    AttributeStatistics,
    TableStatistics,
    analyze_table,
    apply_scan,
    estimate_join_cardinality,
    estimate_scan_cardinality,
    estimate_scan_selectivity,
)
from .ordering import (
    JoinEdge,
    dp_ccp,
    execute_plan,
    greedy_operator_ordering,
    join_table_statistics,
)

__all__ = [
    "JoinEdge",
    "dp_ccp",
    "execute_plan",
    "greedy_operator_ordering",
    "join_table_statistics",
    "AttributeStatistics",
    "TableStatistics",
    "analyze_table",
    "apply_scan",
    "sliced",
    "estimate_join_cardinality",
    "estimate_scan_cardinality",
    "estimate_scan_selectivity",
    "estimate_cross_join",
    "estimate_inner_equi_join",
    "estimate_inner_equi_join_of_bins",
    "estimate_inner_equi_join_with_histograms",
    "estimate_semi_join",
    "scaled",
    "split_at_bin_bounds",
    "StringHistogramDomain",
    "EqualDistinctCountHistogram",
    "GenericHistogram",
    "HistogramBin",
    "edc_histogram_bins",
    "MinMaxFilter",
    "RangeFilter",
    "file_pruning_stats",
    "prune_files",
]
