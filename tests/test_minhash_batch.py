"""Batched signature kernel vs the per-doc reference functions.

The r6 optimization vectorizes dedup/minhash.py's signatures() across the
whole Arrow batch (one FNV pass over a concatenated buffer, segmented
minhash/simhash via ufunc.reduceat, band fold across docs). These tests
pin every output bit to the original per-doc functions, which remain in
the module as the spec: shingle_hashes / minhash_signature / simhash64 /
band_hashes.
"""

from __future__ import annotations

import random

import numpy as np

from hyrise_generalized_dedup_spark.config import GDConfig
from hyrise_generalized_dedup_spark.dedup.minhash import (
    _batch_band_hashes,
    _batch_minhash_simhash,
    _batch_shingle_sets,
    _hash_params,
    band_hashes,
    minhash_signature,
    shingle_hashes,
    simhash64,
)

CFG = GDConfig()


def _random_blobs(rng: random.Random, n: int) -> list[bytes]:
    blobs = []
    for _ in range(n):
        kind = rng.randrange(5)
        if kind == 0:
            blobs.append(b"")  # empty: sentinel path
        elif kind == 1:
            blobs.append(bytes(rng.randrange(256) for _ in range(rng.randrange(1, CFG.shingle_k))))  # < k
        elif kind == 2:
            blobs.append(bytes([rng.randrange(256)]) * rng.randrange(8, 64))  # constant run: 1 distinct shingle
        else:
            blobs.append(bytes(rng.randrange(256) for _ in range(rng.randrange(8, 600))))
    return blobs


def test_batch_shingle_sets_match_per_doc():
    rng = random.Random(7)
    blobs = _random_blobs(rng, 120)
    concat, lens = _batch_shingle_sets(blobs, CFG.shingle_k)
    pos = 0
    for blob, n in zip(blobs, lens):
        ref = shingle_hashes(blob, CFG.shingle_k)
        got = concat[pos : pos + n]
        assert np.array_equal(got, ref), blob
        pos += n
    assert pos == len(concat)


def test_batch_minhash_simhash_band_match_per_doc():
    rng = random.Random(11)
    blobs = _random_blobs(rng, 80)
    a, b = _hash_params(CFG)
    concat, lens = _batch_shingle_sets(blobs, CFG.shingle_k)
    sig_mat, sims = _batch_minhash_simhash(concat, lens, a, b)
    band_mat = _batch_band_hashes(sig_mat, CFG.bands)
    pos = 0
    for i, blob in enumerate(blobs):
        sh = shingle_hashes(blob, CFG.shingle_k)
        assert np.array_equal(sig_mat[i], minhash_signature(sh, a, b))
        assert int(sims[i]) == simhash64(sh)
        assert np.array_equal(band_mat[i], band_hashes(minhash_signature(sh, a, b), CFG.bands))
        pos += lens[i]


def test_batch_group_boundary_and_huge_doc_fallback(monkeypatch):
    """Force tiny vectorization groups so the group loop and the
    single-huge-doc fallback both execute, and still match the spec."""
    import hyrise_generalized_dedup_spark.dedup.minhash as mh

    monkeypatch.setattr(mh, "_GROUP_SHINGLES", 16)
    rng = random.Random(13)
    blobs = [bytes(rng.randrange(256) for _ in range(n)) for n in (200, 9, 8, 0, 40, 300)]
    a, b = _hash_params(CFG)
    concat, lens = mh._batch_shingle_sets(blobs, CFG.shingle_k)
    sig_mat, sims = mh._batch_minhash_simhash(concat, lens, a, b)
    for i, blob in enumerate(blobs):
        sh = shingle_hashes(blob, CFG.shingle_k)
        assert np.array_equal(sig_mat[i], minhash_signature(sh, a, b))
        assert int(sims[i]) == simhash64(sh)
