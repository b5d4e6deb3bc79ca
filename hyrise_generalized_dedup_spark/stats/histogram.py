"""EqualDistinctCount / Generic histograms: distributed build + estimation.

Reference:
- construction `src/lib/statistics/statistics_objects/equal_distinct_count_
  histogram.cpp:102-150` (sorted value distribution split into bins of equal
  distinct count; the first `distinct_count % bin_count` bins carry one extra
  distinct value),
- estimation `statistics_objects/abstract_histogram.cpp:294-455`
  (estimate_cardinality_and_distinct_count per predicate condition,
  bin_ratio_less_than interpolation, does_not_contain pruning checks),
- bin lookup `equal_distinct_count_histogram.cpp:175-195`.

Spark-first construction: the value distribution is a `groupBy(col).count()`
census (one shuffle, bounded by the distinct count, map-side partial agg);
the exact global rank of each distinct value is computed WITHOUT a
single-partition window via range repartition + per-partition offsets (the
zipWithIndex idiom: one P-row collect, then a map-only vectorized pass); the
bin id is a pure integer formula of the rank, so the final `groupBy(bin_id)`
is a B-row aggregate. Every step is exact-integer -> the driver slot is
LIVE-oracled: DuckDB recomputes the identical bins with a ROW_NUMBER window
over the same census.

Estimation is driver-side pure Python over the collected (bin-count-bounded,
<= max_bins rows) result — the same split the reference makes between its
stored histogram object and the estimator that reads it.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass
from typing import Iterator, Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from ..session import shuffle_partitions
from .domain import StringHistogramDomain, next_value_clamped

INVALID_BIN = -1


@dataclass(frozen=True)
class HistogramBin:
    """One bin: [min, max] closed range with height + distinct count
    (`abstract_histogram.hpp` HistogramBin)."""

    min: object
    max: object
    height: float
    distinct_count: float


def _bin_id_for_rank(rank: int, distinct: int, bins: int) -> int:
    """Exact integer bin assignment for the 0-based rank of a distinct
    value: the first `distinct % bins` bins hold `distinct // bins + 1`
    values, the rest hold `distinct // bins`
    (`equal_distinct_count_histogram.cpp:114-126`)."""
    dpb = distinct // bins
    extra = distinct % bins
    wide = extra * (dpb + 1)
    if rank < wide:
        return rank // (dpb + 1)
    return extra + (rank - wide) // dpb


def edc_histogram_bins(df: DataFrame, column: str, max_bins: int) -> DataFrame:
    """Distributed EqualDistinctCountHistogram construction.

    Returns a DataFrame (bin_id BIGINT, bin_min, bin_max, height BIGINT,
    distinct_count BIGINT) ordered by bin_id, with at most
    `min(max_bins, n_distinct)` rows. NULLs are excluded from the value
    distribution (`equal_distinct_count_histogram.cpp:33-35`).

    Scale story: the census shuffle is bounded by the distinct count and
    partial-aggregates map-side; the rank pass collects exactly P partition
    counts (P = shuffle partitions) to the driver and assigns bins map-only
    from broadcast offsets; the final aggregate emits `max_bins` rows. No
    global window, no driver materialization of the census.
    """
    if max_bins <= 0:
        raise ValueError("max_bins must be greater than zero")
    spark = df.sparkSession
    v_type = df.schema[column].dataType.simpleString()
    census = (
        df.where(F.col(column).isNotNull())
        .groupBy(F.col(column).alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        # repartitionByRange evaluates its input twice (boundary sampling
        # pass + the real exchange); persisting the census makes the
        # second pass a cache read instead of a repeat of the base-table
        # shuffle. Bin assignment depends only on exact global ranks, so
        # the result is identical for any sampled boundaries.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_parts = max(2, shuffle_partitions(spark))
    ranked_src = (
        census.repartitionByRange(n_parts, "v")
        .sortWithinPartitions("v")
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        part_counts = {
            int(r["pid"]): int(r["n"])
            for r in ranked_src.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        n_distinct = sum(part_counts.values())
        if n_distinct == 0:
            return spark.createDataFrame(
                [],
                f"bin_id bigint, bin_min {v_type}, bin_max {v_type}, "
                "height bigint, distinct_count bigint",
            )
        n_bins = min(n_distinct, max_bins)
        offsets = {}
        acc = 0
        for pid in sorted(part_counts):
            offsets[pid] = acc
            acc += part_counts[pid]

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            seen = 0
            for pdf in batches:
                if pdf.empty:
                    continue
                base = offsets[int(pdf["pid"].iloc[0])] + seen
                seen += len(pdf)
                ranks = pd.RangeIndex(base, base + len(pdf)).to_numpy()
                dpb = n_distinct // n_bins
                extra = n_distinct % n_bins
                wide = extra * (dpb + 1)
                bin_id = ranks.copy()
                lo = ranks < wide
                bin_id[lo] = ranks[lo] // (dpb + 1)
                bin_id[~lo] = extra + (ranks[~lo] - wide) // dpb
                yield pd.DataFrame({"v": pdf["v"], "c": pdf["c"], "bin_id": bin_id})

        binned = ranked_src.mapInPandas(
            assign, schema=f"v {v_type}, c bigint, bin_id bigint"
        )
        agg = (
            binned.groupBy("bin_id")
            .agg(
                F.min("v").alias("bin_min"),
                F.max("v").alias("bin_max"),
                F.sum("c").alias("height"),
                F.count(F.lit(1)).alias("distinct_count"),
            )
            .orderBy("bin_id")
        )
        # Materialize the <=max_bins-row result WHILE the ranked census is
        # cached (the offsets above index into exactly this partitioning;
        # a lazy result re-running the range shuffle later could see
        # different sampled boundaries). The collect is bin-count-bounded,
        # never data-bounded.
        rows = agg.collect()
        return spark.createDataFrame(rows, schema=agg.schema)
    finally:
        ranked_src.unpersist()
        census.unpersist()


def edc_oracle_sql(table: str, column: str, max_bins: int, where: str = "") -> str:
    """DuckDB twin of `edc_histogram_bins` — the same census, rank, and
    integer bin formula via a ROW_NUMBER window (fine at oracle scale)."""
    cond = f"{column} IS NOT NULL" + (f" AND ({where})" if where else "")
    return f"""
    WITH census AS (
      SELECT {column} AS v, COUNT(*) AS c FROM {table}
      WHERE {cond} GROUP BY 1
    ),
    ranked AS (
      SELECT v, c,
             ROW_NUMBER() OVER (ORDER BY v) - 1 AS r,
             COUNT(*) OVER () AS d
      FROM census
    ),
    binned AS (
      SELECT v, c,
             CASE WHEN r < (d % LEAST(d, {max_bins}))
                           * (d // LEAST(d, {max_bins}) + 1)
                  THEN r // (d // LEAST(d, {max_bins}) + 1)
                  ELSE (d % LEAST(d, {max_bins}))
                       + (r - (d % LEAST(d, {max_bins}))
                              * (d // LEAST(d, {max_bins}) + 1))
                         // (d // LEAST(d, {max_bins}))
             END AS bin_id
      FROM ranked
    )
    SELECT bin_id, MIN(v) AS bin_min, MAX(v) AS bin_max,
           SUM(c) AS height, COUNT(*) AS distinct_count
    FROM binned GROUP BY bin_id
    """


class GenericHistogram:
    """Driver-side histogram estimator replaying the reference's formulas.

    Bins are closed ranges with per-bin height + distinct count
    (`generic_histogram.hpp`); `kind` selects the value domain:
    'int' (width max-min+1), 'float' (width max-min), 'str'
    (StringHistogramDomain prefix representation).
    """

    def __init__(
        self,
        minima: Sequence,
        maxima: Sequence,
        heights: Sequence[float],
        distinct_counts: Sequence[float],
        kind: str = "int",
        domain: StringHistogramDomain | None = None,
    ):
        if not (len(minima) == len(maxima) == len(heights) == len(distinct_counts)):
            raise ValueError("bin vectors must have equal length")
        if not minima:
            raise ValueError("histogram must have at least one bin")
        self.minima = list(minima)
        self.maxima = list(maxima)
        self.heights = [float(h) for h in heights]
        self.distinct_counts = [float(d) for d in distinct_counts]
        self.kind = kind
        self.domain = domain or (StringHistogramDomain() if kind == "str" else None)
        for i in range(len(minima) - 1):
            if not (maxima[i] < minima[i + 1]):
                raise ValueError("bins must be sorted and disjoint")

    # -- bin accessors -------------------------------------------------
    def bin_count(self) -> int:
        return len(self.minima)

    def total_count(self) -> float:
        return sum(self.heights)

    def total_distinct_count(self) -> float:
        return sum(self.distinct_counts)

    def _bin_for_value(self, v) -> int:
        """`equal_distinct_count_histogram.cpp:175-184`."""
        i = bisect.bisect_left(self.maxima, v)
        if i == len(self.maxima) or v < self.minima[i] or v > self.maxima[i]:
            return INVALID_BIN
        return i

    def _next_bin_for_value(self, v) -> int:
        """`equal_distinct_count_histogram.cpp:187-195`."""
        i = bisect.bisect_right(self.maxima, v)
        return INVALID_BIN if i == len(self.maxima) else i

    def _next_value(self, v):
        return next_value_clamped(v, self.kind, self.domain)

    # -- interpolation -------------------------------------------------
    def _string_reprs(self, bin_id: int, v: str) -> tuple[int, int, int]:
        """Common-prefix-stripped numeric reprs for the string ratio
        (`abstract_histogram.cpp:133-155`). The C++ caps the stripped
        prefix with size_t arithmetic that underflows for strings shorter
        than the domain prefix — reproduced here as 'no cap' in that case."""
        dom = self.domain
        bin_min, bin_max = self.minima[bin_id], self.maxima[bin_id]
        natural = 0
        limit = min(len(bin_min), len(bin_max))
        while natural < limit and bin_min[natural] == bin_max[natural]:
            natural += 1
        caps = [
            len(s) - dom.prefix_length
            for s in (bin_min, bin_max)
            if len(s) >= dom.prefix_length
        ]
        common = min(natural, min(caps)) if caps else natural
        value_repr = dom.string_to_number(dom.string_to_domain(v[common:]))
        min_repr = dom.string_to_number(bin_min[common:])
        max_repr = dom.string_to_number(bin_max[common:])
        return value_repr, min_repr, max_repr

    def bin_ratio_less_than(self, bin_id: int, v) -> float:
        """`abstract_histogram.cpp:93-158`."""
        if v <= self.minima[bin_id]:
            return 0.0
        if v > self.maxima[bin_id]:
            return 1.0
        if self.kind == "int":
            width = self.maxima[bin_id] - self.minima[bin_id] + 1
            return (float(v) - float(self.minima[bin_id])) / float(width)
        if self.kind == "float":
            width = self.maxima[bin_id] - self.minima[bin_id]
            return (float(v) - float(self.minima[bin_id])) / float(width)
        value_repr, min_repr, max_repr = self._string_reprs(bin_id, v)
        return (value_repr - min_repr) / float(max_repr - min_repr + 1)

    def bin_ratio_less_than_equals(self, bin_id: int, v) -> float:
        """`abstract_histogram.cpp:160-194` — <=v is <next(v)."""
        if v < self.minima[bin_id]:
            return 0.0
        if v >= self.maxima[bin_id]:
            return 1.0
        return self.bin_ratio_less_than(bin_id, self._next_value(v))

    # -- pruning check -------------------------------------------------
    def does_not_contain(self, cond: str, v, v2=None) -> bool:
        """`abstract_histogram.cpp:203-291`."""
        if self.bin_count() == 0:
            return True
        first_min, last_max = self.minima[0], self.maxima[-1]
        if cond == "=":
            b = self._bin_for_value(v)
            return b == INVALID_BIN or self.heights[b] == 0
        if cond == "!=":
            return first_min == v and last_max == v
        if cond == "<":
            return v <= first_min
        if cond == "<=":
            return v < first_min
        if cond == ">=":
            return v > last_max
        if cond == ">":
            return v >= last_max
        if cond == "between":
            if self.does_not_contain(">=", v):
                return True
            if v2 is None:
                raise ValueError("between needs two values")
            if self.does_not_contain("<=", v2) or v2 < v:
                return True
            b1, b2 = self._bin_for_value(v), self._bin_for_value(v2)
            if (
                b1 == INVALID_BIN
                and b2 == INVALID_BIN
                and self.bin_count() > 1
                and self._next_bin_for_value(v) == self._next_bin_for_value(v2)
            ):
                return True
            if (
                b1 != INVALID_BIN
                and b2 != INVALID_BIN
                and self.heights[b1] == 0
                and self.heights[b2] == 0
            ):
                return all(self.heights[b] == 0 for b in range(b1 + 1, b2))
            return False
        if cond in ("like", "not like"):
            return False
        return False

    # -- estimation ----------------------------------------------------
    def _invert(self, est: tuple[float, float]) -> tuple[float, float]:
        return (self.total_count() - est[0], self.total_distinct_count() - est[1])

    def estimate_cardinality_and_distinct_count(
        self, cond: str, v, v2=None
    ) -> tuple[float, float]:
        """`abstract_histogram.cpp:294-455`."""
        if self.kind == "str" and isinstance(v, str):
            v = self.domain.string_to_domain(v)
        if self.does_not_contain(cond, v, v2):
            return (0.0, 0.0)

        if cond == "=":
            b = self._bin_for_value(v)
            d = self.distinct_counts[b]
            if d == 0:
                return (0.0, 0.0)
            return (self.heights[b] / d, min(d, 1.0))

        if cond == "!=":
            return self._invert(self.estimate_cardinality_and_distinct_count("=", v))

        if cond == "<":
            if v > self.maxima[-1]:
                return (self.total_count(), self.total_distinct_count())
            cardinality = 0.0
            distinct = 0.0
            b = self._bin_for_value(v)
            if b == INVALID_BIN:
                b = self._next_bin_for_value(v)
            elif v == self.minima[b] or self.heights[b] == 0:
                pass  # nothing of this bin is below v
            else:
                share = self.bin_ratio_less_than(b, v)
                cardinality += share * self.heights[b]
                distinct += share * self.distinct_counts[b]
            for i in range(b):
                cardinality += self.heights[i]
                distinct += self.distinct_counts[i]
            return (min(cardinality, self.total_count()), distinct)

        if cond == "<=":
            return self.estimate_cardinality_and_distinct_count("<", self._next_value(v))
        if cond == ">=":
            return self._invert(self.estimate_cardinality_and_distinct_count("<", v))
        if cond == ">":
            return self._invert(self.estimate_cardinality_and_distinct_count("<=", v))

        if cond == "between":
            if v2 is None:
                raise ValueError("between needs two values")
            if self.kind == "str" and isinstance(v2, str):
                v2 = self.domain.string_to_domain(v2)
            if v2 < v:
                return (0.0, 0.0)
            lower_bound, lower_bin = v, self._bin_for_value(v)
            if lower_bin == INVALID_BIN:
                lower_bin = self._next_bin_for_value(v)
                lower_bound = self.minima[lower_bin]
            upper_bound, upper_bin = v2, self._bin_for_value(v2)
            if upper_bin == INVALID_BIN:
                nxt = self._next_bin_for_value(v2)
                upper_bin = self.bin_count() - 1 if nxt == INVALID_BIN else nxt - 1
                upper_bound = self.maxima[upper_bin]
            cardinality = 0.0
            distinct = 0.0
            for b in range(lower_bin, upper_bin + 1):
                cardinality += self.heights[b]
                distinct += self.distinct_counts[b]
            below = self.bin_ratio_less_than(lower_bin, lower_bound)
            cardinality -= self.heights[lower_bin] * below
            distinct -= self.distinct_counts[lower_bin] * below
            above = 1.0 - self.bin_ratio_less_than_equals(upper_bin, upper_bound)
            cardinality -= self.heights[upper_bin] * above
            distinct -= self.distinct_counts[upper_bin] * above
            return (cardinality, distinct)

        if cond in ("like", "not like"):
            return (self.total_count(), self.total_distinct_count())

        raise ValueError(f"predicate not supported: {cond!r}")

    def estimate_cardinality(self, cond: str, v, v2=None) -> float:
        return self.estimate_cardinality_and_distinct_count(cond, v, v2)[0]

    def bin(self, i: int) -> HistogramBin:
        return HistogramBin(
            self.minima[i], self.maxima[i], self.heights[i], self.distinct_counts[i]
        )


class EqualDistinctCountHistogram(GenericHistogram):
    """Generic estimator specialized to the EDC invariant: all bins carry
    `distinct_count_per_bin` distinct values, the first
    `bin_count_with_extra_value` bins one more
    (`equal_distinct_count_histogram.cpp:76-100`)."""

    def __init__(
        self,
        minima: Sequence,
        maxima: Sequence,
        heights: Sequence[float],
        distinct_count_per_bin: int,
        bin_count_with_extra_value: int,
        kind: str = "int",
        domain: StringHistogramDomain | None = None,
    ):
        if distinct_count_per_bin <= 0:
            raise ValueError("cannot have bins with no distinct values")
        if bin_count_with_extra_value >= len(minima):
            raise ValueError("cannot have more bins with extra value than bins")
        distincts = [
            distinct_count_per_bin + (1 if i < bin_count_with_extra_value else 0)
            for i in range(len(minima))
        ]
        super().__init__(minima, maxima, heights, distincts, kind=kind, domain=domain)
        self.distinct_count_per_bin = distinct_count_per_bin
        self.bin_count_with_extra_value = bin_count_with_extra_value

    @classmethod
    def from_dataframe(
        cls,
        df: DataFrame,
        column: str,
        max_bins: int,
        domain: StringHistogramDomain | None = None,
    ) -> "EqualDistinctCountHistogram | None":
        """Distributed build + bounded collect (<= max_bins rows)."""
        rows = edc_histogram_bins(df, column, max_bins).collect()
        if not rows:
            return None
        spark_t = df.schema[column].dataType.simpleString()
        kind = (
            "int"
            if spark_t in ("tinyint", "smallint", "int", "bigint")
            else "float"
            if spark_t in ("float", "double") or spark_t.startswith("decimal")
            else "str"
        )
        n_distinct = sum(int(r["distinct_count"]) for r in rows)
        n_bins = len(rows)
        return cls(
            [r["bin_min"] for r in rows],
            [r["bin_max"] for r in rows],
            [float(r["height"]) for r in rows],
            n_distinct // n_bins,
            n_distinct % n_bins,
            kind=kind,
            domain=domain,
        )
