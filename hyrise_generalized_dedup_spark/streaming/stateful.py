"""Custom stateful streaming operator via applyInPandasWithState.

The built-in operators cover windows and gap sessions (events.py /
sessionize.py); this module is the escape hatch the engine exposes for
semantics Spark lacks — here a per-user RUNNING PROFILE that carries
state across micro-batches:

  (user_id) -> {n_events, total_value, max_value, distinct_event_types}

The distinct-type set is custom state no built-in streaming aggregate
keeps exactly under update semantics (approx_count_distinct is a sketch;
collect_set isn't a streaming-safe aggregate pre-4.x) — a genuine
applyInPandasWithState use case, and the pattern a 100 TB training-data
pipeline needs for per-source quality accounting.

State is bounded: one row per user with a fixed-width struct plus a
capped type set (visible overflow flag, never silent truncation).
Timeouts: processing-time timeout evicts idle users so state can't grow
monotonically on a real stream; the bounded availableNow run keeps every
user (no timeout fires), which is what makes the batch oracle exact.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_TRACKED_TYPES = 16

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("max_value", DoubleType(), True),
        StructField("n_event_types", IntegerType(), False),
        StructField("types_overflow", BooleanType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("max_value", DoubleType(), True),
        StructField("types_csv", StringType(), False),
        StructField("types_overflow", BooleanType(), False),
    ]
)


def _make_update_profile(evict_idle_ms: int | None):
    def update_profile(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total, mx, types_csv, overflow = state.get
            types = set(types_csv.split("|")) if types_csv else set()
        else:
            n, total, mx, types, overflow = 0, 0.0, None, set(), False
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                total += float(vals.sum())
                batch_max = float(vals.max())
                mx = batch_max if mx is None else max(mx, batch_max)
            for t in pdf["event_type"].dropna().unique():
                if len(types) < MAX_TRACKED_TYPES:
                    types.add(str(t))
                elif str(t) not in types:
                    overflow = True
        state.update((n, total, mx, "|".join(sorted(types)), overflow))
        if evict_idle_ms is not None:
            state.setTimeoutDuration(evict_idle_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
                "n_event_types": [len(types)],
                "types_overflow": [overflow],
            }
        )

    return update_profile


def user_profiles_stream(events: DataFrame, evict_idle_ms: int | None = None) -> DataFrame:
    """Streaming per-user profile via applyInPandasWithState (update mode).

    evict_idle_ms: on a real unbounded stream, pass e.g. 3_600_000 to
    evict users idle for an hour (ProcessingTimeTimeout) so state is
    bounded. Leave None for bounded availableNow runs — a pending
    processing-time timer keeps the query alive past end-of-input."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_profile(evict_idle_ms),
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def user_profiles_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the exact aggregation the stateful stream converges to
    over a bounded source (distinct types exceed MAX_TRACKED_TYPES only
    with the overflow flag raised)."""
    agg = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
        F.countDistinct("event_type").alias("exact_types"),
    )
    return agg.select(
        "user_id",
        "n_events",
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        "max_value",
        F.least(F.col("exact_types"), F.lit(MAX_TRACKED_TYPES))
        .cast("int")
        .alias("n_event_types"),
        (F.col("exact_types") > MAX_TRACKED_TYPES).alias("types_overflow"),
    )
