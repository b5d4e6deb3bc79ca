"""Per-file pruning statistics: MinMaxFilter + RangeFilter over parquet.

Reference: `src/lib/statistics/statistics_objects/min_max_filter.cpp:103-160`
and `range_filter.cpp:36-300` (gap-based ranges: keep the `max_ranges - 1`
largest gaps between adjacent sorted distinct values), driven by
`generate_pruning_statistics.cpp` and consumed by the optimizer's
ChunkPruningRule (`chunk_pruning_rule.cpp`).

The reference attaches these filters per chunk/segment; the Spark-native
unit of pruning is the parquet FILE (row-group stats already give Spark
min/max skipping for free — the RangeFilter adds gap-awareness that parquet
stats cannot express: a file holding {1..10, 90..100} prunes `= 50` here
but not via min/max). Stats are built in one `applyInPandas` pass grouped
by `input_file_name()` — each task sees one file's rows, computes
min/max/null-count and the gap ranges vectorized in numpy. The stats table
is metadata-sized (one row per file), the natural fit for a driver-side
rule — but prune decisions still run distributed (mapInPandas over the
stats table) so a 100 TB table with millions of files never collects.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class MinMaxFilter:
    """`min_max_filter.cpp:103-160`."""

    min: object
    max: object

    def does_not_contain(self, cond: str, v, v2=None) -> bool:
        if v is None or (cond == "between" and v2 is None):
            return False
        if cond == ">":
            return v >= self.max
        if cond == ">=":
            return v > self.max
        if cond == "<":
            return v <= self.min
        if cond == "<=":
            return v < self.min
        if cond == "=":
            return v < self.min or v > self.max
        if cond == "!=":
            return v == self.min and v == self.max
        if cond == "between":  # BetweenInclusive
            return v > self.max or v2 < self.min
        return False


@dataclass(frozen=True)
class RangeFilter:
    """`range_filter.cpp` — sorted disjoint [lo, hi] ranges; values between
    adjacent ranges are guaranteed absent."""

    ranges: tuple[tuple[object, object], ...]

    @classmethod
    def build(cls, sorted_distinct: Sequence, max_ranges: int) -> "RangeFilter | None":
        """`range_filter.cpp:36-120`: keep the `max_ranges - 1` largest
        gaps between adjacent sorted distinct values (ties broken by
        position, matching std::sort on (gap desc))."""
        if max_ranges <= 0:
            raise ValueError("max_ranges must be larger than zero")
        vals = list(sorted_distinct)
        if not vals:
            return None
        if len(vals) == 1 or max_ranges == 1:
            return cls(((vals[0], vals[-1]),))
        arr = np.asarray(vals, dtype=np.float64)
        gaps = arr[1:] - arr[:-1]
        keep = min(max_ranges - 1, len(gaps))
        # largest gaps, then restore dictionary order (steps 2-4)
        order = np.argsort(-gaps, kind="stable")[:keep]
        cut_idx = np.sort(order)
        ranges = []
        start = 0
        for i in cut_idx:
            ranges.append((vals[start], vals[int(i)]))
            start = int(i) + 1
        ranges.append((vals[start], vals[-1]))
        return cls(tuple(ranges))

    def does_not_contain(self, cond: str, v, v2=None) -> bool:
        """`range_filter.cpp:219-300`."""
        if v is None or (cond == "between" and v2 is None):
            return False
        lo_all, hi_all = self.ranges[0][0], self.ranges[-1][1]
        if cond == ">":
            return v >= hi_all
        if cond == ">=":
            return v > hi_all
        if cond == "<":
            return v <= lo_all
        if cond == "<=":
            return v < lo_all
        if cond == "=":
            return not any(lo <= v <= hi for lo, hi in self.ranges)
        if cond == "!=":
            return len(self.ranges) == 1 and lo_all == v and hi_all == v
        if cond == "between":
            if v > hi_all or v2 < lo_all:
                return True
            for (_, hi), (nlo, _) in zip(self.ranges, self.ranges[1:]):
                if hi < v and v2 < nlo:
                    return True  # both bounds inside the same gap
            return False
        return False


def file_pruning_stats(
    df: DataFrame, column: str, max_ranges: int = 10
) -> DataFrame:
    """Per-parquet-file pruning statistics for a numeric column.

    Returns (file STRING, n_rows, n_nulls, vmin, vmax, range_lo ARRAY,
    range_hi ARRAY). One applyInPandas task per file — numpy unique/diff
    inside, nothing corpus-sized crosses to the driver.
    """
    v_type = df.schema[column].dataType.simpleString()
    out_schema = (
        f"file string, n_rows bigint, n_nulls bigint, vmin {v_type}, "
        f"vmax {v_type}, range_lo array<{v_type}>, range_hi array<{v_type}>"
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["__v"]
        nn = vals.dropna()
        if nn.empty:
            return pd.DataFrame(
                {
                    "file": [pdf["__file"].iloc[0]],
                    "n_rows": [len(pdf)],
                    "n_nulls": [len(pdf)],
                    "vmin": [None],
                    "vmax": [None],
                    "range_lo": [[]],
                    "range_hi": [[]],
                }
            )
        uniq = np.unique(nn.to_numpy())
        rf = RangeFilter.build(uniq.tolist(), max_ranges)
        return pd.DataFrame(
            {
                "file": [pdf["__file"].iloc[0]],
                "n_rows": [len(pdf)],
                "n_nulls": [int(vals.isna().sum())],
                "vmin": [uniq[0]],
                "vmax": [uniq[-1]],
                "range_lo": [[lo for lo, _ in rf.ranges]],
                "range_hi": [[hi for _, hi in rf.ranges]],
            }
        )

    return (
        df.select(
            F.input_file_name().alias("__file"), F.col(column).alias("__v")
        )
        .groupBy("__file")
        .applyInPandas(stats, schema=out_schema)
    )


def prune_files(stats: DataFrame, cond: str, v, v2=None) -> DataFrame:
    """ChunkPruningRule analog over the per-file stats table: marks each
    file `prunable` when EITHER filter proves `column <cond> v` matches no
    row in it (`chunk_pruning_rule.cpp` consults all available filters;
    any one sufficing prunes). All-null files carry no filter and are
    never pruned — reference parity (`range_filter.cpp:47-50` returns
    nullptr for empty dictionaries). Runs distributed via mapInPandas;
    sound by construction (pruned => zero matching rows), verified against
    a brute-force per-file oracle in tests/test_stats.py.
    """

    def decide(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flags = []
            for _, row in pdf.iterrows():
                if row["vmin"] is None or (
                    isinstance(row["vmin"], float) and np.isnan(row["vmin"])
                ):
                    flags.append(False)
                    continue
                mm = MinMaxFilter(row["vmin"], row["vmax"])
                rf = RangeFilter(
                    tuple(zip(list(row["range_lo"]), list(row["range_hi"])))
                )
                flags.append(
                    mm.does_not_contain(cond, v, v2)
                    or rf.does_not_contain(cond, v, v2)
                )
            yield pd.DataFrame({"file": pdf["file"], "prunable": flags})

    return stats.mapInPandas(decide, schema="file string, prunable boolean")
