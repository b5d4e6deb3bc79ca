"""MinHash signatures over k-shingles + SimHash, one vectorized pass.

No counterpart exists in the reference snapshot (SURVEY.md §2.12) — the
algorithm is specified by BASELINE.json north_star directly: batched
MinHash over k-shingles with LSH band hashing, SimHash for fuzzy
matching.

Kernel design (Arrow-batched pandas UDF, numpy inner loops, no per-row
Python hashing):
- shingles: sliding k-byte windows -> 64-bit FNV-1a computed column-wise
  (k vectorized passes over all windows of a document);
- minhash: h_i(s) = a_i * s + b_i  (mod 2^64, multiply-shift family,
  seeded numpy-generated odd multipliers), signature = column-min of the
  (num_hashes x n_shingles) matrix;
- simhash: sign of the bit-count sum over the shingle hash bits;
- band keys: FNV mix of each band's signature rows -> int64, computed
  here so the LSH stage is a pure JVM-side posexplode (no second UDF).

Determinism: all parameters derive from GDConfig.seed via
numpy.random.Generator(PCG64(seed)); same config -> same signatures on
any worker, any partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..config import GDConfig

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

_EMPTY_SENTINEL = np.uint64(0xE3B0C44298FC1C14)  # stand-in shingle for len<k docs


def _hash_params(cfg: GDConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(cfg.seed))
    a = rng.integers(1, 2**63, size=cfg.num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=cfg.num_hashes, dtype=np.uint64)
    return a, b


def shingle_hashes(blob: bytes, k: int) -> np.ndarray:
    """Distinct 64-bit FNV-1a hashes of all k-byte windows (vectorized)."""
    arr = np.frombuffer(blob, np.uint8)
    n = len(arr) - k + 1
    if n <= 0:
        # shorter than one shingle: hash the whole blob so distinct short
        # docs stay distinct (two empty docs still agree -> jaccard 1)
        h = _FNV_OFFSET
        with np.errstate(over="ignore"):
            for byte in arr:
                h = (h ^ np.uint64(byte)) * _FNV_PRIME
        return np.array([h ^ _EMPTY_SENTINEL], dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
        for j in range(k):
            h = (h ^ arr[j : j + n].astype(np.uint64)) * _FNV_PRIME
    return np.unique(h)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_hashes,) uint64 signature: min over multiply-shift hashes."""
    with np.errstate(over="ignore"):
        # (H, S) matrix; S is bounded by doc size, H=128 — chunk if huge
        if shingles.size * a.size > 4_000_000:
            sig = np.full(a.size, np.iinfo(np.uint64).max, dtype=np.uint64)
            for lo in range(0, shingles.size, 16384):
                part = a[:, None] * shingles[None, lo : lo + 16384] + b[:, None]
                np.minimum(sig, part.min(axis=1), out=sig)
            return sig
        m = a[:, None] * shingles[None, :] + b[:, None]
        return m.min(axis=1)


def _avalanche(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — FNV-1a alone has biased high bits on short
    inputs, which collapses SimHash votes to all-ones; full avalanche
    restores per-bit uniformity."""
    with np.errstate(over="ignore"):
        h = h.copy()
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash over the shingle hash multiset."""
    shingles = _avalanche(shingles)
    bits = np.unpackbits(shingles.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1)
    # signed arithmetic: unsigned sums wrap negative votes to 2^64-ish and
    # set every bit (regression covered by test_simhash_unrelated_docs_far_apart)
    votes = bits.sum(axis=0).astype(np.int64) * 2 - np.int64(bits.shape[0])
    out = np.uint64(0)
    for i, v in enumerate(votes):
        if v > 0:
            out |= np.uint64(1) << np.uint64(63 - i)
    return int(out)


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """FNV mix of each band's rows -> (bands,) int64 keys."""
    rows = sig.reshape(bands, -1)
    with np.errstate(over="ignore"):
        h = np.full(bands, _FNV_OFFSET, dtype=np.uint64)
        for j in range(rows.shape[1]):
            h = (h ^ rows[:, j]) * _FNV_PRIME
            # extra avalanche: shingle-independent mix
            h = (h ^ (h >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
    return h.astype(np.int64)


def exact_jaccard(a: bytes, b: bytes, k: int) -> float:
    """Brute-force oracle (test-only)."""
    sa, sb = set(shingle_hashes(a, k).tolist()), set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def shingle_counts(
    df: DataFrame,
    cfg: GDConfig,
    text_col: str = "content",
    key_col: str = "doc_key",
) -> DataFrame:
    """-> (key, n_shingles): the distinct-shingle census WITHOUT the
    minhash/simhash/band computation. ``n_shingles`` is bit-identical to
    ``signatures(...)``'s column (same ``shingle_hashes`` kernel); use
    this when only the census is consumed — the 128-hash signature
    matrix is ~2/3 of the full kernel's work (guide §1.2: don't compute
    what you throw away)."""
    k = cfg.shingle_k
    out_schema = StructType(
        [
            StructField(key_col, df.schema[key_col].dataType, False),
            StructField("n_shingles", LongType(), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = [
                shingle_hashes((text or "").encode("utf-8"), k).size
                for text in pdf[text_col]
            ]
            yield pd.DataFrame({key_col: pdf[key_col], "n_shingles": counts})

    return df.select(key_col, text_col).mapInPandas(compute, out_schema)


def signatures(
    df: DataFrame,
    cfg: GDConfig,
    text_col: str = "content",
    key_col: str = "doc_key",
    with_simhash: bool = True,
) -> DataFrame:
    """-> (key, minhash array<long>, simhash long, band array<long>, n_shingles).

    Map-only single pass; downstream LSH/SimHash stages are pure DataFrame
    ops over these columns. minhash stored as int64 (bit-reinterpreted
    uint64) — comparisons downstream are equality-only so sign is moot.

    ``with_simhash=False`` emits 0 in the simhash column (schema
    unchanged) and skips its per-doc bit-unpack + vote pass — for
    consumers that only use the minhash/band columns (the LSH-only gates
    and cross-corpus decontamination), ~25% of the kernel."""
    a, b = _hash_params(cfg)
    k, bands = cfg.shingle_k, cfg.bands

    out_schema = StructType(
        [
            StructField(key_col, df.schema[key_col].dataType, False),
            # downstream only ever compares components for equality, so the
            # low 32 bits suffice (collision 2^-32/component); int32 halves
            # the signature bytes in every checkpoint and pair-join shuffle
            StructField("minhash", ArrayType(IntegerType(), False), False),
            StructField("simhash", LongType(), False),
            StructField("band", ArrayType(LongType(), False), False),
            StructField("n_shingles", LongType(), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, sigs, sims, bandks, nsh = [], [], [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                blob = (text or "").encode("utf-8")
                sh = shingle_hashes(blob, k)
                sig = minhash_signature(sh, a, b)
                keys.append(key)
                sigs.append(sig.astype(np.uint32).astype(np.int32).tolist())
                sims.append(simhash64(sh) if with_simhash else 0)
                bandks.append(band_hashes(sig, bands).tolist())
                nsh.append(sh.size)
            yield pd.DataFrame(
                {
                    key_col: keys,
                    "minhash": sigs,
                    "simhash": np.array(sims, dtype=np.uint64).astype(np.int64),
                    "band": bandks,
                    "n_shingles": nsh,
                }
            )

    return df.select(key_col, text_col).mapInPandas(compute, out_schema)
