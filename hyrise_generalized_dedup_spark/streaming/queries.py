"""Driver-gate queries: Structured Streaming with batch-equivalent oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .events import run_stream_batch

STREAM_QUERIES = {}
STREAM_ORACLES = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        STREAM_QUERIES[name] = fn
        if oracle is not None:
            STREAM_ORACLES[name] = oracle
        return fn

    return deco


@_register(
    "stream_windowed_counts",
    """
    SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Structured Streaming query (readStream -> watermark ->
    tumbling window -> memory sink, availableNow trigger) whose bounded
    result equals the batch aggregation DuckDB computes — the
    batch-equivalence property of well-formed streaming plans."""
    out = run_stream_batch(spark, sf_dir, window="5 minutes")
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        "total_value",
    )
