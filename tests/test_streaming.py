"""Structured Streaming: bounded-source run equals batch aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.streaming.events import run_stream_batch


def test_stream_equals_batch(spark, sf_tiny):
    out = run_stream_batch(spark, sf_tiny, window="5 minutes")
    batch = (
        spark.read.parquet(f"{sf_tiny}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("window.start").alias("win_start"), "event_type", "n_events", "total_value")
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0
