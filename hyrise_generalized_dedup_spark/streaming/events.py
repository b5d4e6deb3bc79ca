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

import os
import tempfile
import uuid

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
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    agg = windowed_aggregation(stream, window)
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    # materialize before the memory sink is dropped by later queries
    result = spark.createDataFrame(out.collect(), out.schema)
    return result
