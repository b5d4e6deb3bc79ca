"""Partition-local suffix-array pass: exact shared-substring detection
within clusters.

Runs AFTER clustering, per cluster, via applyInPandas — clusters are
small by construction (LSH groups near-dups; the hot-bucket star rule
bounds pathological ones), so a partition-local pass is safe. Hard caps
with a visible overflow marker, never silent truncation (north rule).

Kernel per cluster (pure numpy, also the unit-test surface):
- concatenate member docs, 0x00-sentinel-separated, track boundaries;
- suffix array via prefix doubling (numpy lexsort, O(n log^2 n));
- walk maximal runs of adjacent suffixes whose LCP >= suffix_min_len;
  every pair of distinct docs inside a run shares a substring of at
  least the run-min LCP -> emit (key_a, key_b, shared_len >= min_len).
  shared_len is a lower bound of the true max shared substring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..config import GDConfig

_EDGE_SCHEMA = StructType(
    [
        StructField("key_a", StringType(), False),
        StructField("key_b", StringType(), False),
        StructField("shared_len", LongType(), False),
        StructField("source", StringType(), False),
    ]
)

MAX_CLUSTER_BYTES = 1 << 18  # 256 KiB concatenated text per cluster
_LCP_CAP = 1 << 15
_MAX_RUN_DOCS = 64  # pairs per run capped at 64*63/2


def build_suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of uint8 array s by prefix doubling."""
    n = len(s)
    if n == 0:
        return np.zeros(0, np.int64)
    rank = s.astype(np.int64)
    order = np.argsort(rank, kind="stable")
    # past-end marker: strictly below every possible value/rank (the buffer
    # may legally contain negative sentinel values, so -1 is not safe)
    _PAST_END = np.iinfo(np.int64).min + 1
    k = 1
    while True:
        key2 = np.full(n, _PAST_END, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        neq = np.empty(n, bool)
        neq[0] = False
        r_o, k_o = rank[order], key2[order]
        neq[1:] = (r_o[1:] != r_o[:-1]) | (k_o[1:] != k_o[:-1])
        new_rank = np.empty(n, np.int64)
        new_rank[order] = np.cumsum(neq)
        rank = new_rank
        if rank[order[-1]] == n - 1 or k >= n:
            return order
        k *= 2


def _lcp_adjacent(buf: np.ndarray, i: int, j: int, end_i: int, end_j: int) -> int:
    """LCP of suffixes i and j, capped at each suffix's OWN document end.

    All document sentinels are the same 0x00 byte, so an uncapped compare
    would run past a sentinel and match content from the NEXT document,
    emitting false shared-substring pairs. Capping at min(doc_end - pos)
    keeps the comparison inside both documents (sound lower bound)."""
    cap = min(end_i - i, end_j - j, _LCP_CAP)
    if cap <= 0:
        return 0
    a = buf[i : i + cap]
    b = buf[j : j + cap]
    neq = a != b
    idx = int(np.argmax(neq))
    return cap if not neq.any() else idx


def shared_substring_pairs(
    docs: list[tuple[str, bytes]], min_len: int
) -> set[tuple[str, str, int]]:
    """-> {(key_a, key_b, shared_len)} for doc pairs sharing a substring of
    length >= min_len (shared_len is a >=min_len lower bound of the max)."""
    if len(docs) < 2:
        return set()
    # int32 buffer with a UNIQUE negative sentinel per document: identical
    # sentinels would let suffixes shorter than min_len sort INSIDE the
    # interval of a shared periodic block (e.g. a run of identical bytes),
    # splitting the LCP run and silently missing the pair — found by the
    # hypothesis soundness/completeness property test. Unique sentinels
    # push every short suffix out of the interval, so the two long
    # occurrences become adjacent and the pair is always emitted.
    parts, bounds, keys = [], [0], []
    for k_idx, (key, blob) in enumerate(docs):
        parts.append(np.frombuffer(blob, np.uint8).astype(np.int32))
        parts.append(np.full(1, -(k_idx + 1), np.int32))  # unique sentinel
        bounds.append(bounds[-1] + len(blob) + 1)
        keys.append(key)
    buf = np.concatenate(parts) if parts else np.zeros(0, np.int32)
    sa = build_suffix_array(buf)
    bounds_arr = np.array(bounds[1:])
    doc_of = np.searchsorted(bounds_arr, sa, side="right")
    # Content end (sentinel position, exclusive) of each suffix's own doc.
    content_end = bounds_arr[doc_of] - 1

    # Runs of adjacent suffixes with LCP >= min_len: every doc pair inside
    # a run shares at least run_min (= min adjacent LCP over the run) —
    # a sound lower bound of the true max shared substring.
    best: dict[tuple[int, int], int] = {}
    run_set: set[int] = set()
    run_min = _LCP_CAP

    def flush() -> None:
        nonlocal run_set, run_min
        if len(run_set) > 1:
            ds = sorted(run_set)[:_MAX_RUN_DOCS]
            for x in range(len(ds)):
                for y in range(x + 1, len(ds)):
                    kk = (ds[x], ds[y])
                    if best.get(kk, 0) < run_min:
                        best[kk] = run_min
        run_set, run_min = set(), _LCP_CAP

    for idx in range(1, len(sa)):
        l = _lcp_adjacent(
            buf,
            int(sa[idx - 1]),
            int(sa[idx]),
            int(content_end[idx - 1]),
            int(content_end[idx]),
        )
        if l >= min_len:
            if not run_set:
                run_set.add(int(doc_of[idx - 1]))
            run_set.add(int(doc_of[idx]))
            run_min = min(run_min, l)
        else:
            flush()
    flush()
    return {(keys[a], keys[b], int(l)) for (a, b), l in best.items() if a != b}


def suffix_edges(
    clustered_docs: DataFrame,
    cfg: GDConfig,
    key_col: str = "doc_key",
    text_col: str = "content",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """clustered_docs(key, text, cluster_id) -> suffix edges per cluster.

    One shuffle on cluster_id; per-cluster caps (suffix_max_cluster
    members, MAX_CLUSTER_BYTES bytes) emit a visible 'suffix_overflow'
    marker row instead of silently dropping."""
    min_len = cfg.suffix_min_len
    max_members = cfg.suffix_max_cluster

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in _EDGE_SCHEMA.fields]
        if len(pdf) < 2:
            return pd.DataFrame(columns=cols)
        rows = sorted(zip(pdf[key_col], pdf[text_col]))
        truncated = len(rows) > max_members
        rows = rows[:max_members]
        docs, total = [], 0
        for k, t in rows:
            blob = (t or "").encode("utf-8")
            if total + len(blob) > MAX_CLUSTER_BYTES:
                truncated = True
                break
            docs.append((k, blob))
            total += len(blob)
        out = [
            {"key_a": a, "key_b": b, "shared_len": l, "source": "suffix"}
            for a, b, l in shared_substring_pairs(docs, min_len)
        ]
        if truncated:
            out.append(
                {
                    "key_a": rows[0][0],
                    "key_b": rows[0][0],
                    "shared_len": int(len(pdf)),
                    "source": "suffix_overflow",
                }
            )
        return pd.DataFrame(out, columns=cols)

    # Singleton clusters (≈half the corpus on dup-heavy inputs) can never
    # emit an edge, but their CONTENT would still cross the shuffle and
    # cost one python group invocation each. A census semi-join drops them
    # BEFORE the shuffle — map-side partial count, int64 ids only, output
    # identical (per_cluster returns empty for singletons anyway).
    multi = (
        clustered_docs.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") > 1)
        .select(cluster_col)
    )
    return (
        clustered_docs.select(key_col, text_col, cluster_col)
        .join(multi, cluster_col, "left_semi")
        .groupBy(cluster_col)
        .applyInPandas(per_cluster, _EDGE_SCHEMA)
    )
