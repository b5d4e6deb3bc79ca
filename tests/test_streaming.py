"""Structured Streaming: bounded-source run equals batch aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.streaming.events import run_stream_batch


def test_session_window_stream_equals_batch_sessionize(spark, sf_tiny):
    """The streaming session_window operator and the batch lag/cumsum
    sessionizer implement the same gap definition."""
    import uuid

    from hyrise_generalized_dedup_spark.streaming.events import EVENTS_SCHEMA
    from hyrise_generalized_dedup_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    events = spark.read.parquet(f"{sf_tiny}/events.parquet")
    batch = sessionize_batch(events.withColumn("ts", F.col("ts").cast("timestamp")), 30)
    b = sorted((r.user_id, str(r.session_start), r.n_events) for r in batch.collect())

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="sess_stream_")
    os.symlink(os.path.abspath(f"{sf_tiny}/events.parquet"), os.path.join(d, "e.parquet"))
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    agg = sessionize_stream(stream, 30)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    s = sorted(
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.table(name).collect()
    )
    assert s == b and len(s) > 0


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


def test_stateful_profiles_across_microbatches(spark, sf_tiny, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    two single-file batches (maxFilesPerTrigger=1) must converge to the
    batch profile for every user."""
    import math
    import uuid

    from hyrise_generalized_dedup_spark.streaming.events import EVENTS_SCHEMA
    from hyrise_generalized_dedup_spark.streaming.stateful import (
        user_profiles_batch,
        user_profiles_stream,
    )

    events = spark.read.parquet(f"{sf_tiny}/events.parquet")
    # split into two files so the file source runs two micro-batches
    src = tmp_path / "events_split"
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src), mode="append"
    )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"prof_{uuid.uuid4().hex[:8]}"
    q = (
        user_profiles_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    out = spark.table(name)
    # update-mode memory sink appends one row per user per batch touched;
    # the final profile is the row with the highest n_events (monotone)
    final = {}
    for r in out.collect():
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur.n_events:
            final[r.user_id] = r
    expected = {r.user_id: r for r in user_profiles_batch(events).collect()}
    assert set(final) == set(expected)
    n_multi_batch = 0
    for uid, exp in expected.items():
        got = final[uid]
        assert got.n_events == exp.n_events, uid
        assert math.isclose(got.total_value, exp.total_value, rel_tol=1e-9), uid
        assert got.max_value == exp.max_value, uid
        assert got.n_event_types == exp.n_event_types, uid
        assert got.types_overflow == exp.types_overflow, uid
    # the stream really ran >1 micro-batch (state crossed batches)
    assert out.count() > len(expected), "expected per-batch update rows"


def test_stream_empty_source_returns_empty(spark, tmp_path):
    """ADVICE r2: an empty bounded events source must yield an empty
    result with the aggregation schema, not TypeError on max_ts=None."""
    from hyrise_generalized_dedup_spark.streaming.events import (
        EVENTS_SCHEMA,
        run_stream_batch,
    )

    sf_dir = str(tmp_path / "empty_sf")
    spark.createDataFrame([], EVENTS_SCHEMA).write.parquet(f"{sf_dir}/events.parquet")
    out = run_stream_batch(spark, sf_dir)
    assert out.count() == 0
    assert set(out.columns) == {"win_start", "event_type", "n_events", "total_value"}
