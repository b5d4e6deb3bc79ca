"""Streaming ordered-funnel progress via applyInPandasWithState.

Batch funnel analysis (functions/queries events_funnel) answers "who
converted" after the fact; a product pipeline also wants the running
answer as events arrive. The ordered-funnel semantics (each step's
FIRST event must fall strictly after the previous step's first event)
is genuinely stateful and order-sensitive: a late-arriving early 'view'
can retroactively qualify a 'click' that looked too early — so naive
"keep the min timestamp per step" state is WRONG under out-of-order
delivery across micro-batches.

Exactness with bounded state: per user we keep the first step's min
timestamp (monotonically decreasing — always safe) plus a CAPPED sorted
list of candidate timestamps for each later step. The funnel chain
(t1 = min view; t2 = min click > t1; t3 = min purchase > t2) is
recomputed from that state on every update, so late data re-qualifies
steps correctly as long as a user has at most ``MAX_TS_PER_STEP``
events of a step type; beyond the cap the largest timestamps are shed
and the row carries a visible ``state_overflow`` flag (the same
capped-state-with-visible-overflow rule as streaming/stateful.py —
never silent truncation). State per user is O(steps × cap) longs.

The bounded availableNow run converges to exactly the batch funnel
(tests/test_streaming.py drives multi-file out-of-order input and
diffs against funnel_batch).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# view -> click -> purchase, the canonical conversion chain over the
# events table; parameterize by passing a different tuple to the fns.
FUNNEL_STEPS = ("view", "click", "purchase")

MAX_TS_PER_STEP = 64

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("reached_view", IntegerType(), False),
        StructField("reached_click", IntegerType(), False),
        StructField("reached_purchase", IntegerType(), False),
        StructField("state_overflow", BooleanType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("t1_us", LongType(), True),
        StructField("step2_csv", StringType(), False),
        StructField("step3_csv", StringType(), False),
        StructField("overflow", BooleanType(), False),
    ]
)


def _merge_capped(existing: list[int], new: list[int]) -> tuple[list[int], bool]:
    """Keep the MAX_TS_PER_STEP smallest timestamps; report whether any
    were shed (sheds can only be the LARGEST, which matters only for
    funnels whose previous step starts later than everything kept —
    hence the visible flag instead of silent exactness claims)."""
    merged = sorted(set(existing) | set(new))
    if len(merged) <= MAX_TS_PER_STEP:
        return merged, False
    return merged[:MAX_TS_PER_STEP], True


def _chain(t1: int | None, step2: list[int], step3: list[int]) -> tuple[int, int, int]:
    if t1 is None:
        return 0, 0, 0
    t2 = next((t for t in step2 if t > t1), None)
    if t2 is None:
        return 1, 0, 0
    t3 = next((t for t in step3 if t > t2), None)
    return 1, 1, int(t3 is not None)


def _make_update_funnel(steps: tuple[str, str, str], evict_idle_ms: int | None):
    def update_funnel(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle eviction: drop the state and emit nothing — without
            # this, a timed-out key would be re-update()d and its timer
            # re-armed forever (state never bounded, spurious duplicate
            # rows per interval)
            state.remove()
            return
        if state.exists:
            t1, s2_csv, s3_csv, overflow = state.get
            step2 = [int(x) for x in s2_csv.split("|") if x]
            step3 = [int(x) for x in s3_csv.split("|") if x]
        else:
            t1, step2, step3, overflow = None, [], [], False
        for pdf in pdfs:
            us = pdf["ts"].astype("int64")  # pandas datetime64[us/ns] -> int
            for stype, ts_us in zip(pdf["event_type"], us):
                ts_us = int(ts_us)
                if stype == steps[0]:
                    t1 = ts_us if t1 is None else min(t1, ts_us)
                elif stype == steps[1]:
                    step2, shed = _merge_capped(step2, [ts_us])
                    overflow = overflow or shed
                elif stype == steps[2]:
                    step3, shed = _merge_capped(step3, [ts_us])
                    overflow = overflow or shed
        state.update(
            (t1, "|".join(map(str, step2)), "|".join(map(str, step3)), overflow)
        )
        if evict_idle_ms is not None:
            state.setTimeoutDuration(evict_idle_ms)
        r1, r2, r3 = _chain(t1, step2, step3)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "reached_view": [r1],
                "reached_click": [r2],
                "reached_purchase": [r3],
                "state_overflow": [overflow],
            }
        )

    return update_funnel


def funnel_stream(
    events: DataFrame,
    steps: tuple[str, str, str] = FUNNEL_STEPS,
    evict_idle_ms: int | None = None,
) -> DataFrame:
    """Streaming running funnel (update mode): one row per user per
    micro-batch that touched them, carrying the current reached flags.
    Pass evict_idle_ms on unbounded streams to bound state."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.filter(F.col("event_type").isin(*steps))
        .select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_funnel(steps, evict_idle_ms),
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def funnel_batch(
    events: DataFrame, steps: tuple[str, str, str] = FUNNEL_STEPS
) -> DataFrame:
    """Batch ordered funnel: per-user reached flags where each step's
    first event falls strictly after the previous step's first event.
    Three level-wise min-joins, every shuffle keyed on user_id; prior
    steps shrink each level's probe side. The registry query
    events_funnel and the streaming twin both resolve to this shape."""

    def first_after(step_type: str, prev: DataFrame | None, t_out: str) -> DataFrame:
        e = events.filter(F.col("event_type") == step_type)
        if prev is not None:
            t_prev = [c for c in prev.columns if c != "user_id"][0]
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(t_prev))
        return e.groupBy("user_id").agg(F.min("ts").alias(t_out))

    s1 = first_after(steps[0], None, "t1")
    s2 = first_after(steps[1], s1, "t2")
    s3 = first_after(steps[2], s2, "t3")
    users = events.select("user_id").distinct()
    out = (
        users.join(s1.withColumn("r1", F.lit(1)).select("user_id", "r1"), "user_id", "left")
        .join(s2.withColumn("r2", F.lit(1)).select("user_id", "r2"), "user_id", "left")
        .join(s3.withColumn("r3", F.lit(1)).select("user_id", "r3"), "user_id", "left")
    )
    return out.select(
        "user_id",
        F.coalesce(F.col("r1"), F.lit(0)).cast("int").alias(f"reached_{steps[0]}"),
        F.coalesce(F.col("r2"), F.lit(0)).cast("int").alias(f"reached_{steps[1]}"),
        F.coalesce(F.col("r3"), F.lit(0)).cast("int").alias(f"reached_{steps[2]}"),
    )
