"""Streaming NEAR-duplicate candidate detection over a document feed.

streaming/dedup.py handles exact dedup on the ingest stream; this module
is the LSH twin: MinHash band signatures are computed per arriving
document (the same Arrow kernel the batch pipeline uses — mapInPandas
runs unchanged inside Structured Streaming), and a custom stateful
operator keyed on (band_id, band_hash) remembers each bucket's FIRST
arrival as its anchor. Every later document that lands in an occupied
bucket is emitted immediately as a candidate pair (anchor_id, doc_id)
— the streaming form of the batch pipeline's star-edge candidate
generation (dedup/lsh.py), with the same O(members) per-bucket output
instead of O(members^2) all-pairs.

State is one long per occupied bucket (bounded by distinct buckets in
the horizon, not by corpus size); ``evict_idle_ms`` arms a processing-
time timeout so idle buckets are dropped on a real unbounded stream —
after eviction a bucket re-anchors on its next arrival, exactly the
horizon-bounded semantics of first_seen in streaming/dedup.py.

Batch-split invariants (pytest oracle, tests/test_streaming.py): no
matter how the feed is chopped into micro-batches, each bucket of n
members emits exactly n-1 candidate rows, every emitted anchor is a
bucket member, and the connected components of the candidate graph are
identical to the batch twin's — anchor IDENTITY depends on arrival
order (first arrival wins; the batch twin's min-id anchor matches the
id-ordered feed), but the component structure does not.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..config import GDConfig
from ..dedup.lsh import band_table
from ..dedup.minhash import signatures

CANDIDATE_SCHEMA = StructType(
    [
        StructField("band_id", IntegerType(), False),
        StructField("band_hash", LongType(), False),
        StructField("anchor_id", LongType(), False),
        StructField("doc_id", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType([StructField("anchor_id", LongType(), False)])


def _make_update_bucket(evict_idle_ms: int | None):
    def update_bucket(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # idle bucket evicted; the next arrival re-anchors it
            state.remove()
            return
        band_id, band_hash = key
        ids: list[int] = sorted(
            int(i) for pdf in pdfs for i in pdf["doc_id"].tolist()
        )
        if not ids:
            return
        if state.exists:
            anchor = int(state.get[0])
        else:
            # within one micro-batch the smallest id stands in for "first
            # arrival" (the feed is id-ordered; see module docstring)
            anchor = ids[0]
        state.update((anchor,))
        if evict_idle_ms is not None:
            state.setTimeoutDuration(evict_idle_ms)
        out = [i for i in ids if i != anchor]
        if out:
            yield pd.DataFrame(
                {
                    "band_id": pd.array([band_id] * len(out), dtype="int32"),
                    "band_hash": pd.array([band_hash] * len(out), dtype="int64"),
                    "anchor_id": pd.array([anchor] * len(out), dtype="int64"),
                    "doc_id": pd.array(out, dtype="int64"),
                }
            )

    return update_bucket


def lsh_candidates_stream(
    docs: DataFrame, cfg: GDConfig | None = None, evict_idle_ms: int | None = None
) -> DataFrame:
    """(band_id, band_hash, anchor_id, doc_id) candidate pairs, emitted
    the moment a document collides with an occupied LSH bucket.

    Works on a stream (stateful, cross-micro-batch anchors) AND on a
    static frame (one "batch", anchors = per-bucket min id). Signature
    computation is the batch pipeline's own Arrow kernel, so streamed
    candidates are directly comparable to dedup/lsh.py's."""
    cfg = cfg or GDConfig()
    sigs = signatures(docs, cfg, text_col="text", key_col="doc_id")
    bt = band_table(sigs, key_col="doc_id")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return bt.groupBy("band_id", "band_hash").applyInPandasWithState(
        _make_update_bucket(evict_idle_ms),
        outputStructType=CANDIDATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def lsh_candidates_batch(docs: DataFrame, cfg: GDConfig | None = None) -> DataFrame:
    """Batch twin: per-bucket star edges around the min-id member — the
    aggregation the stateful stream converges to over an id-ordered
    bounded feed (and component-equivalent under ANY feed order)."""
    cfg = cfg or GDConfig()
    sigs = signatures(docs, cfg, text_col="text", key_col="doc_id")
    bt = band_table(sigs, key_col="doc_id")
    anchors = bt.groupBy("band_id", "band_hash").agg(
        F.min("doc_id").alias("anchor_id")
    )
    return (
        bt.join(anchors, ["band_id", "band_hash"])
        .filter(F.col("doc_id") != F.col("anchor_id"))
        .select("band_id", "band_hash", "anchor_id", "doc_id")
    )
