"""Sessionization — batch (window/lag) and stateful-streaming variants.

Batch: the classic gap-based sessionizer (lag + cumulative sum over a
user window) — pure Catalyst, used for the driver gate with a SQL oracle.

Streaming: session_window aggregation — Spark's native gap-session
operator under watermarking, the streaming twin of the batch definition.
(applyInPandasWithState would be the fully-custom-state route; the
built-in session_window covers these semantics without hand-rolled state,
per the Spark-first rule.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """-> (user_id, session_id, n_events, session_start, session_end).

    A new session starts when the gap to the previous event of the same
    user exceeds `gap_minutes`."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_break = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    with_sid = with_break.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming gap sessions via session_window + watermark."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
