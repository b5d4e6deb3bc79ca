"""Driver-gate queries: histogram statistics over the TPC-H tables.

The EqualDistinctCountHistogram build is exact-integer end-to-end (census
counts, ranks, the bin-assignment formula), so the slot is LIVE-oracled:
DuckDB recomputes the identical bins from the same parquet via a
ROW_NUMBER window (`edc_oracle_sql`). Three value domains are exercised —
int64 (orders.o_custkey), string (part.p_name), double
(lineitem.l_extendedprice) — matching the reference's template
instantiations (`equal_distinct_count_histogram.cpp:176-180`
EXPLICITLY_INSTANTIATE_DATA_TYPES).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .histogram import edc_histogram_bins, edc_oracle_sql

STATS_QUERIES = {}
STATS_ORACLES = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        STATS_QUERIES[name] = fn
        if oracle is not None:
            STATS_ORACLES[name] = oracle
        return fn

    return deco


_HIST_COLUMNS = [
    # (tag, table, column, numeric?, max_bins)
    ("orders.o_custkey", "orders", "o_custkey", True, 8),
    ("part.p_name", "part", "p_name", False, 8),
    ("lineitem.l_extendedprice", "lineitem", "l_extendedprice", True, 8),
]


def _hist_oracle() -> str:
    parts = []
    for tag, table, column, numeric, max_bins in _HIST_COLUMNS:
        num_min = "CAST(bin_min AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        num_max = "CAST(bin_max AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        str_min = "CAST(NULL AS VARCHAR)" if numeric else "CAST(bin_min AS VARCHAR)"
        str_max = "CAST(NULL AS VARCHAR)" if numeric else "CAST(bin_max AS VARCHAR)"
        parts.append(
            f"SELECT '{tag}' AS col_name, CAST(bin_id AS BIGINT) AS bin_id, "
            f"{num_min} AS bin_min_num, {num_max} AS bin_max_num, "
            f"{str_min} AS bin_min_str, {str_max} AS bin_max_str, "
            f"CAST(height AS BIGINT) AS height, "
            f"CAST(distinct_count AS BIGINT) AS distinct_count "
            f"FROM ({edc_oracle_sql(table, column, max_bins)}) h_{table}_{column}"
        )
    return "\nUNION ALL\n".join(parts)


@_register("table_edc_histogram", _hist_oracle())
def table_edc_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EqualDistinctCountHistogram bins for three columns spanning the
    int/string/float histogram domains; bit-exact vs the DuckDB window
    restatement (heights/distincts are exact integers, bin edges are
    untouched source values).

    The three builds are independent eager jobs (census shuffle + range
    repartition + bounded collects each), so they run from a small driver
    thread pool — Spark schedules concurrent jobs FIFO and the later
    builds back-fill the earlier ones' stragglers (guide-standard overlap
    of independent jobs); results are exact regardless of interleaving."""
    from concurrent.futures import ThreadPoolExecutor

    def _build(spec):
        _tag, table, column, _numeric, max_bins = spec
        return edc_histogram_bins(load_table(spark, sf_dir, table), column, max_bins)

    with ThreadPoolExecutor(max_workers=len(_HIST_COLUMNS)) as pool:
        built = list(pool.map(_build, _HIST_COLUMNS))

    out = None
    for (tag, table, column, numeric, max_bins), bins in zip(_HIST_COLUMNS, built):
        part = bins.select(
            F.lit(tag).alias("col_name"),
            F.col("bin_id").cast("long"),
            (
                F.col("bin_min").cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias("bin_min_num"),
            (
                F.col("bin_max").cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias("bin_max_num"),
            (
                F.lit(None).cast("string")
                if numeric
                else F.col("bin_min").cast("string")
            ).alias("bin_min_str"),
            (
                F.lit(None).cast("string")
                if numeric
                else F.col("bin_max").cast("string")
            ).alias("bin_max_str"),
            F.col("height").cast("long"),
            F.col("distinct_count").cast("long"),
        )
        out = part if out is None else out.unionByName(part)
    return out
