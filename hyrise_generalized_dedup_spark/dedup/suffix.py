"""Partition-local suffix-array pass: exact shared-substring detection
within clusters.

Runs AFTER clustering, per cluster, via applyInPandas — clusters are
small by construction (LSH groups near-dups; the hot-bucket star rule
bounds pathological ones), so a partition-local pass is safe. Hard caps
with a visible overflow marker, never silent truncation (north rule).

Kernel per cluster (pure numpy, also the unit-test surface):
- concatenate member docs, sentinel-separated, track boundaries;
- suffix array via prefix doubling (numpy lexsort, O(n log^2 n));
- adjacent-suffix LCPs computed VECTORIZED from the doubling rank
  levels (O(log n) numpy passes over all adjacent pairs at once — the
  previous per-suffix python loop was 55% of the whole pipeline wall);
- walk maximal runs of adjacent suffixes whose LCP >= suffix_min_len;
  every pair of distinct docs inside a run shares a substring of at
  least the run-min LCP -> emit (key_a, key_b, shared_len >= min_len).
  shared_len is a lower bound of the true max shared substring.

Shuffle shape: clusters are salted into a bounded number of buckets and
MANY clusters ride in one applyInPandas group — one python/Arrow group
invocation per bucket instead of per cluster (tens of thousands of
multi-doc clusters at bench scale). Per-cluster caps still apply inside
the bucket kernel, so one bucket's memory is bounded by
(multi-doc content / n_buckets) + the per-cluster caps.
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
_MIN_BUCKETS = 256  # floor on cluster->bucket fan-out (memory bound per group)


def _suffix_array_levels(s: np.ndarray) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Suffix array by prefix doubling + the rank array of every doubling
    level [(prefix_len, ranks), ...] for vectorized LCP lookups.

    Each doubling step sorts ONE combined int64 key
    ``rank * (n+1) + next_rank_shifted`` instead of a two-key lexsort —
    ranks are < n so the combination is collision-free, past-end maps to
    0 (strictly below every shifted rank, so a shorter suffix sorts
    first), and a single argsort pass is ~2x a lexsort. Tie order inside
    an argsort is irrelevant: equal combined keys get equal new ranks,
    and the returned order comes from the final level where all keys are
    distinct."""
    n = len(s)
    if n == 0:
        return np.zeros(0, np.int64), []
    # initial ranks must be a dense order-preserving relabel when values
    # can be arbitrary ints (negative sentinels): rank*(n+1) overflows
    # otherwise. np.unique gives exactly that.
    _, rank = np.unique(s, return_inverse=True)
    rank = rank.astype(np.int64)
    levels = [(1, rank)]
    k = 1
    while True:
        key2 = np.zeros(n, dtype=np.int64)  # 0 == past-end (below all)
        if k < n:
            key2[: n - k] = rank[k:] + 1
        combined = rank * (n + 1) + key2
        order = np.argsort(combined)
        neq = np.empty(n, bool)
        neq[0] = False
        c_o = combined[order]
        neq[1:] = c_o[1:] != c_o[:-1]
        new_rank = np.empty(n, np.int64)
        new_rank[order] = np.cumsum(neq)
        rank = new_rank
        levels.append((2 * k, rank))
        if rank[order[-1]] == n - 1 or k >= n:
            return order, levels
        k *= 2


def build_suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of uint8/int32 array s by prefix doubling."""
    return _suffix_array_levels(s)[0]


def _adjacent_lcp(
    sa: np.ndarray, levels: list[tuple[int, np.ndarray]], n: int
) -> np.ndarray:
    """lcp[t] = LCP(suffix sa[t], suffix sa[t+1]) for all t, vectorized.

    Standard sparse-table descent over the doubling ranks: rank equality
    at prefix length L between two DISTINCT suffixes implies both have
    >= L chars remaining and those L chars match (the PAST_END padding
    inside the doubling keys encodes remaining length, so a truncated
    prefix can only tie with an equally-truncated one — i.e. the same
    suffix). Hence descending over levels accumulates the exact LCP in
    O(log n) whole-array numpy passes — no per-suffix python loop.

    No document-boundary cap is needed by callers that separate docs
    with UNIQUE sentinels: a sentinel occurs once in the buffer, so any
    true LCP already stops at/before each suffix's own doc end."""
    m = len(sa) - 1
    if m <= 0:
        return np.zeros(0, np.int64)
    i = sa[:-1].astype(np.int64)
    j = sa[1:].astype(np.int64)
    lcp = np.zeros(m, np.int64)
    for length, r in reversed(levels):
        ii = i + lcp
        jj = j + lcp
        valid = (ii < n) & (jj < n)
        iic = np.where(valid, ii, 0)
        jjc = np.where(valid, jj, 0)
        eq = valid & (r[iic] == r[jjc])
        lcp[eq] += length
    return np.minimum(lcp, _LCP_CAP)


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
    # occurrences become adjacent and the pair is always emitted. They
    # also bound every LCP at its own doc end (see _adjacent_lcp).
    parts, bounds, keys = [], [0], []
    for k_idx, (key, blob) in enumerate(docs):
        parts.append(np.frombuffer(blob, np.uint8).astype(np.int32))
        parts.append(np.full(1, -(k_idx + 1), np.int32))  # unique sentinel
        bounds.append(bounds[-1] + len(blob) + 1)
        keys.append(key)
    buf = np.concatenate(parts) if parts else np.zeros(0, np.int32)
    sa, levels = _suffix_array_levels(buf)
    bounds_arr = np.array(bounds[1:])
    doc_of = np.searchsorted(bounds_arr, sa, side="right")
    lcp = _adjacent_lcp(sa, levels, len(buf))

    # Maximal runs of adjacent suffixes with LCP >= min_len: every doc
    # pair inside a run shares at least run_min (= min adjacent LCP over
    # the run) — a sound lower bound of the true max shared substring.
    # Near-dup clusters produce THOUSANDS of runs per cluster (any dip
    # below min_len splits one), so everything below is whole-array
    # numpy; python touches only runs spanning >= 3 distinct docs (rare).
    good = lcp >= min_len
    if not good.any():
        return set()
    flips = np.diff(good.astype(np.int8))
    starts = np.flatnonzero(flips == 1) + 1
    ends = np.flatnonzero(flips == -1) + 1  # exclusive into lcp
    if good[0]:
        starts = np.concatenate(([0], starts))
    if good[-1]:
        ends = np.concatenate((ends, [len(good)]))
    n_runs = len(starts)

    # run_min per run: reduceat over a gap-masked copy — odd slots cover
    # the gaps between runs and are discarded. The +inf sentinel appended
    # at the end keeps a final end index == len(lcp) legal.
    big = np.iinfo(np.int64).max
    masked = np.append(np.where(good, lcp, big), big)
    bnd = np.empty(2 * n_runs, np.int64)
    bnd[0::2] = starts
    bnd[1::2] = ends
    run_min = np.minimum.reduceat(masked, bnd)[0::2]

    # distinct docs per run: flatten every run's suffix span (run r
    # covers doc_of[starts[r] : ends[r]+1]) and unique on a combined
    # (run, doc) key — one sort for ALL runs instead of np.unique per run.
    lens = ends - starts + 1
    total = int(lens.sum())
    run_of = np.repeat(np.arange(n_runs, dtype=np.int64), lens)
    span_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total) - np.repeat(span_start, lens) + np.repeat(starts, lens)
    n_docs = len(keys)
    uniq = np.unique(run_of * n_docs + doc_of[pos])
    useg = uniq // n_docs
    udoc = uniq % n_docs
    seg_first = np.concatenate(([0], np.flatnonzero(np.diff(useg)) + 1))
    seg_count = np.diff(np.append(seg_first, len(useg)))
    # every run holds >= 2 suffixes, so every run id appears in useg and
    # seg_first/seg_count are indexable BY run id
    # cap docs-per-run at _MAX_RUN_DOCS, keeping the SMALLEST doc ids
    # (udoc is ascending within each run by construction of the key)
    rank_in_seg = np.arange(len(useg)) - np.repeat(seg_first, seg_count)
    keep = rank_in_seg < _MAX_RUN_DOCS
    capped_count = np.minimum(seg_count, _MAX_RUN_DOCS)

    # pair expansion, fully vectorized: the kept entry at rank k of its
    # run is the LARGER element of k pairs, one per lower-ranked entry of
    # the same run — so repeat() each entry k times and index its
    # partners contiguously from the run's start in the kept arrays.
    udoc_k = udoc[keep]
    useg_k = useg[keep]
    rk_k = rank_in_seg[keep]
    total_pairs = int(rk_k.sum())
    if total_pairs == 0:
        return set()
    kept_first = np.concatenate(([0], np.cumsum(capped_count)[:-1]))
    pb = np.repeat(udoc_k, rk_k)
    pl = np.repeat(run_min[useg_k], rk_k)
    pair_off = np.arange(total_pairs) - np.repeat(
        np.concatenate(([0], np.cumsum(rk_k)[:-1])), rk_k
    )
    pa = udoc_k[np.repeat(kept_first[useg_k], rk_k) + pair_off]
    # pa < pb always: udoc ascends within a run and rank(pa) < rank(pb)
    # best shared_len per doc pair across runs
    pair_key, inv = np.unique(pa * n_docs + pb, return_inverse=True)
    best = np.zeros(len(pair_key), np.int64)
    np.maximum.at(best, inv, pl)
    ka = pair_key // n_docs
    kb = pair_key % n_docs
    return {
        (keys[int(a)], keys[int(b)], int(l)) for a, b, l in zip(ka, kb, best)
    }


def cluster_substring_edges(
    pdf: pd.DataFrame,
    min_len: int,
    max_members: int,
    key_col: str = "doc_key",
    text_col: str = "content",
) -> list[dict[str, object]]:
    """Edge rows for ONE cluster's member frame (caps + overflow marker).

    Split out of the Spark stage so the cap/overflow semantics are unit-
    testable without a session."""
    if len(pdf) < 2:
        return []
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
    return out


def suffix_edges(
    clustered_docs: DataFrame,
    cfg: GDConfig,
    key_col: str = "doc_key",
    text_col: str = "content",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """clustered_docs(key, text, cluster_id) -> suffix edges per cluster.

    One shuffle on a salted cluster bucket; per-cluster caps
    (suffix_max_cluster members, MAX_CLUSTER_BYTES bytes) emit a visible
    'suffix_overflow' marker row instead of silently dropping."""
    min_len = cfg.suffix_min_len
    max_members = cfg.suffix_max_cluster

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in _EDGE_SCHEMA.fields]
        out: list[dict[str, object]] = []
        for _, cluster_pdf in pdf.groupby(cluster_col, sort=False):
            out.extend(
                cluster_substring_edges(
                    cluster_pdf, min_len, max_members, key_col, text_col
                )
            )
        return pd.DataFrame(out, columns=cols)

    # Singleton clusters (≈half the corpus on dup-heavy inputs) can never
    # emit an edge, but their CONTENT would still cross the shuffle and
    # cost kernel time. A census semi-join drops them BEFORE the shuffle —
    # map-side partial count, int64 ids only, output identical
    # (cluster_substring_edges returns [] for singletons anyway).
    multi = (
        clustered_docs.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") > 1)
        .select(cluster_col)
    )
    # Salt clusters into a bounded bucket count: ONE python/Arrow group
    # invocation per bucket, not per cluster (tens of thousands of
    # multi-doc clusters at bench scale made per-cluster invocation
    # overhead the stage's dominant cost). 8x the shuffle-partition
    # count keeps every core busy with small tasks; the floor bounds a
    # bucket's resident content to ~(multi-doc content / _MIN_BUCKETS).
    from ..session import shuffle_partitions

    par = shuffle_partitions(clustered_docs.sparkSession)
    n_buckets = max(par * 8, _MIN_BUCKETS)
    return (
        clustered_docs.select(key_col, text_col, cluster_col)
        .join(multi, cluster_col, "left_semi")
        .withColumn("_bkt", F.pmod(F.xxhash64(cluster_col), F.lit(n_buckets)))
        .groupBy("_bkt")
        .applyInPandas(per_bucket, _EDGE_SCHEMA)
    )
