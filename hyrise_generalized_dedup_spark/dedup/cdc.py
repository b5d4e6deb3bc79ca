"""Content-defined chunking (gear rolling hash) for the GD transform.

Fixed-size chunking (dedup/gd.py, reference analog Chunk::DEFAULT_SIZE,
src/lib/storage/chunk.hpp:53) is byte-offset addressed: inserting ONE
byte at the front of a file shifts every later segment boundary, so no
downstream segment dedups against the original. Content-defined
chunking cuts where a rolling hash of the last w bytes hits a mask —
boundaries are a function of LOCAL content, so an insertion only
disturbs the chunks that overlap it (the classic result from the
LBFS/FastCDC line of work; gear hash per the public FastCDC paper,
Xia et al., USENIX ATC'16).

Kernel design (scale): boundary candidates are computed for a WHOLE
Arrow batch in one vectorized pass — the gear hash after byte i,

    h_i = sum_{k=0}^{63} gear[b_{i-k}] << k   (mod 2^64),

depends only on the last 64 bytes, so the full-buffer hash array is 64
shifted vector adds over the gear-mapped bytes (no per-byte Python).
Min/max chunk-size enforcement then walks only the sparse candidate
list. The Spark stage is map-only `mapInPandas` — same zero-shuffle
contract as `gd_segments`; content never travels past it.

Determinism: the gear table derives from sha256 of the byte value — no
RNG state, so goldens and cross-run bit-equality hold everywhere.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# --- parameters (defaults sized for source files of a few KB) -------------
MIN_SIZE = 64        # no cut before this many bytes into a chunk
AVG_BITS = 8         # mask has 8 bits -> expected ~256B + MIN_SIZE chunks
MAX_SIZE = 1024      # forced cut: bounds worst-case chunk length

_WINDOW = 64  # gear window: bits shifted out of a uint64 after 64 steps

_GEAR = np.array(
    [
        int.from_bytes(hashlib.sha256(bytes([i])).digest()[:8], "big")
        for i in range(256)
    ],
    dtype=np.uint64,
)

# AVG_BITS mask bits spread across the hash's middle (FastCDC's spread
# masks): low bits of h_i see only the newest few bytes, the top bit sees
# carries from everything; spreading keeps each masked bit sensitive to a
# healthy slice of the 64-byte window.
_MASK = np.uint64(sum(1 << (8 + i * (48 // AVG_BITS)) for i in range(AVG_BITS)))


def gear_hashes(buf: np.ndarray) -> np.ndarray:
    """h_i (uint64) for every prefix end i of ``buf`` — vectorized.

    64 shifted adds; uint64 wraparound IS the mod 2^64."""
    g = _GEAR[buf]
    h = np.zeros(len(buf), dtype=np.uint64)
    for k in range(min(_WINDOW, len(buf))):
        # term gear[b_{i-k}] << k lands at positions i >= k
        h[k:] += g[: len(buf) - k] << np.uint64(k)
    return h


def _select_cuts(candidates: np.ndarray, n: int) -> list[int]:
    """Greedy min/max walk over sparse candidate positions.

    A candidate at index i means a cut AFTER byte i (end offset i+1).
    Each chunk ends at the first candidate >= MIN_SIZE into it, at
    MAX_SIZE if none fires, or at n when less than MIN_SIZE remains."""
    cuts: list[int] = []
    start = 0
    while start < n:
        if n - start <= MIN_SIZE:
            cuts.append(n)
            break
        hi = min(start + MAX_SIZE, n)
        pos = int(np.searchsorted(candidates, start + MIN_SIZE - 1, side="left"))
        cut = hi
        if pos < len(candidates) and candidates[pos] + 1 <= hi:
            cut = int(candidates[pos]) + 1
        cuts.append(cut)
        start = cut
    return cuts


def cdc_boundaries(content: bytes) -> list[int]:
    """Chunk END offsets for ``content`` (pure oracle-friendly path)."""
    if not content:
        return []
    buf = np.frombuffer(content, dtype=np.uint8)
    h = gear_hashes(buf)
    candidates = np.nonzero((h & _MASK) == 0)[0]
    return _select_cuts(candidates, len(buf))


# Cap on concatenated payload bytes per gear sweep group: bounds the
# kernel working set (~2 uint64 arrays of this length) for corpora of
# large files while still amortizing the 64 shifted adds over many docs.
_SWEEP_BYTES = 1 << 21  # 2 MiB


def _batch_gear_hashes(blobs: list[bytes]) -> tuple[np.ndarray, list[int]]:
    """Gear hashes for a whole batch in 64-pass sweeps over bounded groups.

    Concatenates the gear-mapped byte values with a 64-entry ZERO pad
    between docs: h_i only sees the last 64 positions, zero gear entries
    contribute nothing, so every in-doc position's hash is bit-identical
    to ``gear_hashes`` run on that doc alone — while the 64 shifted adds
    run once per sweep group instead of once per document (the dominant
    cost of the CDC census was numpy call overhead on per-doc 2 KB
    arrays). Groups are capped at ``_SWEEP_BYTES`` of payload so the
    working set stays bounded when documents are large.
    Returns ``(h_all, offsets)``; doc i's hashes are
    ``h_all[offsets[i] : offsets[i] + len(blobs[i])]``."""
    total = sum(len(b) for b in blobs) + _WINDOW * len(blobs)
    h = np.zeros(total, dtype=np.uint64)
    offs: list[int] = []
    g0 = 0
    base = 0
    while g0 < len(blobs):
        g1 = g0 + 1
        group_payload = len(blobs[g0])
        while g1 < len(blobs) and group_payload + len(blobs[g1]) <= _SWEEP_BYTES:
            group_payload += len(blobs[g1])
            g1 += 1
        span = group_payload + _WINDOW * (g1 - g0)
        g = np.zeros(span, dtype=np.uint64)
        pos = 0
        for blob in blobs[g0:g1]:
            offs.append(base + pos)
            if blob:
                g[pos : pos + len(blob)] = _GEAR[np.frombuffer(blob, np.uint8)]
            pos += len(blob) + _WINDOW
        hg = h[base : base + span]
        for k in range(min(_WINDOW, span)):
            hg[k:] += g[: span - k] << np.uint64(k)
        base += span
        g0 = g1
    return h, offs


def cdc_boundaries_oracle(content: bytes) -> list[int]:
    """Byte-at-a-time reference implementation (int arithmetic only) —
    the independent oracle the vectorized kernel is tested against."""
    if not content:
        return []
    mask = int(_MASK)
    gear = [int(x) for x in _GEAR]
    h = 0
    candidates = []
    for i, b in enumerate(content):
        h = ((h << 1) + gear[b]) & 0xFFFFFFFFFFFFFFFF
        if (h & mask) == 0:
            candidates.append(i)
    cuts: list[int] = []
    start = 0
    n = len(content)
    while start < n:
        if n - start <= MIN_SIZE:
            cuts.append(n)
            break
        hi = min(start + MAX_SIZE, n)
        eligible = [c for c in candidates if c >= start + MIN_SIZE - 1]
        cut = hi
        if eligible and eligible[0] + 1 <= hi:
            cut = eligible[0] + 1
        cuts.append(cut)
        start = cut
    return cuts


def cdc_chunks(content: bytes) -> list[bytes]:
    """content -> list of chunk payloads (concatenation == content)."""
    out = []
    start = 0
    for end in cdc_boundaries(content):
        out.append(content[start:end])
        start = end
    return out


# ---------------------------------------------------------------------------
# Spark stage

_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("seg_idx", LongType(), False),
        StructField("seg_len", IntegerType(), False),
        StructField("chunk_fp", BinaryType(), False),
    ]
)


def cdc_chunk_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, seg_idx, seg_len, chunk_fp=sha256[:16]) per CDC chunk.

    Map-only: boundaries + fingerprints are computed inside one
    mapInPandas pass; chunk *bytes* never leave the stage — downstream
    dedup joins carry 16-byte fingerprints, the same late-
    materialization contract as gd_segments (reference:
    src/lib/storage/reference_segment.hpp:19-20)."""
    src = docs.select(F.col("doc_id").cast("long"), F.col(text_col).alias("_txt"))

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            fps: list[bytes] = []
            blobs = [
                (txt if isinstance(txt, str) else "").encode("utf-8")
                for txt in pdf["_txt"]
            ]
            # one 64-pass gear sweep for the whole batch (bit-identical to
            # per-doc cdc_boundaries — see _batch_gear_hashes)
            h_all, offs = _batch_gear_hashes(blobs)
            for doc_id, blob, off in zip(pdf["doc_id"], blobs, offs):
                if not blob:
                    continue
                h = h_all[off : off + len(blob)]
                candidates = np.nonzero((h & _MASK) == 0)[0]
                start = 0
                for j, end in enumerate(_select_cuts(candidates, len(blob))):
                    ids.append(doc_id)
                    idxs.append(j)
                    lens.append(end - start)
                    fps.append(hashlib.sha256(blob[start:end]).digest()[:16])
                    start = end
            yield pd.DataFrame(
                {"doc_id": ids, "seg_idx": idxs, "seg_len": lens, "chunk_fp": fps}
            )

    return src.mapInPandas(transform, _CHUNK_SCHEMA)


def cdc_chunk_census(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level CDC dedup census: one summary row.

    dedup_ratio = total chunk bytes / distinct-chunk bytes — what a
    content-addressed store would save under CDC segmentation."""
    chunks = cdc_chunk_table(docs, text_col)
    per_fp = chunks.groupBy("chunk_fp").agg(
        F.count("*").alias("n_copies"), F.first("seg_len").alias("seg_len")
    )
    return per_fp.agg(
        F.sum(F.col("n_copies") * F.col("seg_len")).alias("total_bytes"),
        F.sum("seg_len").alias("distinct_bytes"),
        F.sum("n_copies").alias("n_chunks"),
        F.count("*").alias("n_distinct_chunks"),
    ).select(
        "n_chunks",
        "n_distinct_chunks",
        "total_bytes",
        "distinct_bytes",
        (F.col("total_bytes") / F.col("distinct_bytes")).alias("dedup_ratio"),
    )
