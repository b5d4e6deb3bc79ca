"""Driver-gate queries: Structured Streaming with batch-equivalent oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .events import run_stream_batch
from .sessionize import sessionize_batch

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
    "stream_dedup_census",
    """
    SELECT strftime(make_timestamp((((1577836800 + doc_id) // 60) * 60) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           sha256(text) AS content_sha,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY 1, 2
    """,
)
def stream_dedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup census as a REAL Structured Streaming job (readStream
    over the documents feed -> watermark -> 1-min tumbling window ->
    sha-grouped census -> parquet sink, availableNow): per window, one
    row per distinct content sha with copy count and canonical min-id
    doc. Ingest time derives deterministically from doc_id (1 doc/s
    from a fixed epoch) so DuckDB recomputes the same windows in batch
    — the streaming/batch equivalence oracle of streaming/dedup.py."""
    import os

    from .dedup import run_census_stream

    out = run_census_stream(
        spark, os.path.join(sf_dir, "documents.parquet"), window="1 minute"
    )
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "content_sha",
        "n_copies",
        "canonical_doc_id",
    )


@_register(
    "sessionize_events",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sid AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start
    FROM sid GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) — lag + running sum windows;
    the streaming twin (session_window + watermark) lives in
    sessionize.sessionize_stream and is covered by tests."""
    from ..sources.tables import load_table
    from .sessionize import sessionize_batch as sb

    events = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    import pyspark.sql.functions as FF
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = FF.col("ts_us") - FF.lag("ts_us").over(w)
    with_sid = (
        events.withColumn(
            "is_new", FF.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            FF.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        FF.count(FF.lit(1)).alias("n_events"),
        FF.date_format(FF.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
    )


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
    tumbling window -> parquet sink + read-back, availableNow trigger;
    nothing flows through the driver) whose bounded result equals the
    batch aggregation DuckDB computes — the batch-equivalence property
    of well-formed streaming plans."""
    out = run_stream_batch(spark, sf_dir, window="5 minutes")
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        "total_value",
    )
