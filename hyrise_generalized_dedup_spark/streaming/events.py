"""Streaming pipelines over the `events` table.

Batch-equivalent semantics: every streaming query here has the property
that running it over a bounded file source with an availableNow trigger
produces exactly the batch aggregation over the same data — which is
what makes a DuckDB SQL oracle possible for the driver gate.

At scale the same code reads kafka/object-store streams; watermarks
bound state, windows align to the epoch (cross-engine: duckdb
time_bucket aligns identically).
"""

from __future__ import annotations

import datetime
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampNTZType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def windowed_aggregation(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Tumbling-window count/sum per event_type with a 10-minute
    watermark; decimal-cast sum for cross-engine exactness."""
    # watermarks require TIMESTAMP (LTZ); the parquet column is NTZ — with
    # the session pinned to UTC the cast is value-preserving
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_batch(
    spark: SparkSession, sf_dir: str, window: str = "5 minutes"
) -> DataFrame:
    """Drive the streaming query over the bounded parquet source to
    completion (availableNow) and return the result as a DataFrame."""
    # the file stream source requires a directory; expose the single
    # parquet file through a temp symlink dir (read-only testdata)
    src_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"), os.path.join(src_dir, "events.parquet"))

    # parquet sink + read-back: the result never flows through the driver
    # (a memory sink + collect() caps the stream at driver heap; a file
    # sink is the shape that scales to a real cluster and is exactly how
    # the batch pipeline checkpoints stages). The parquet sink requires
    # append mode, which only emits windows the WATERMARK has passed — on
    # a bounded source the last 10 minutes of windows would stay open
    # forever. A single far-future sentinel row pushes the watermark past
    # every real window (the standard bounded-stream flush); its own
    # window stays open and is never emitted, and its event_type marker is
    # filtered from the read-back as defense in depth.
    max_ts = (
        spark.read.parquet(f"{sf_dir}/events.parquet").agg(F.max("ts")).collect()[0][0]
    )
    if max_ts is None:
        # empty bounded source: nothing to flush, nothing to aggregate —
        # return an empty frame with the aggregation schema instead of
        # TypeError-ing on max_ts + timedelta
        return spark.createDataFrame(
            [],
            "win_start timestamp, event_type string, n_events bigint, total_value double",
        )
    sentinel = spark.createDataFrame(
        [(int(-1), max_ts + datetime.timedelta(days=2), int(-1), "__flush__", 0.0, "{}")],
        EVENTS_SCHEMA,
    )
    sentinel.coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    agg = windowed_aggregation(stream, window)
    out_dir = tempfile.mkdtemp(prefix="events_stream_out_")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "result"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(out_dir, "result")).filter(
        F.col("event_type") != "__flush__"
    )
