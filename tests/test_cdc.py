"""Content-defined chunking: vectorized gear kernel vs byte-at-a-time
oracle, min/max invariants, shift resilience, and the Spark census
(dedup/cdc.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.dedup.cdc import (
    AVG_BITS,
    MAX_SIZE,
    MIN_SIZE,
    cdc_boundaries,
    cdc_boundaries_oracle,
    cdc_chunk_census,
    cdc_chunk_table,
    cdc_chunks,
)


def _rand(n: int, seed: int = 0) -> bytes:
    return np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8).tobytes()


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=6000))
def test_vectorized_kernel_matches_sequential_oracle(data: bytes):
    assert cdc_boundaries(data) == cdc_boundaries_oracle(data)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=6000))
def test_chunks_partition_the_content(data: bytes):
    chunks = cdc_chunks(data)
    assert b"".join(chunks) == data
    # every chunk bounded above; all but the last bounded below
    for c in chunks[:-1]:
        assert MIN_SIZE <= len(c) <= MAX_SIZE
    if chunks:
        assert 1 <= len(chunks[-1]) <= MAX_SIZE


def test_expected_chunk_size_near_target():
    sizes = np.diff([0] + cdc_boundaries(_rand(400_000)))
    # geometric(2^-AVG_BITS) + MIN_SIZE floor -> ~MIN+2^AVG_BITS expected
    target = MIN_SIZE + 2**AVG_BITS
    assert 0.7 * target < sizes.mean() < 1.3 * target


def test_boundaries_are_content_local_shift_resilience():
    """Prepending bytes must NOT re-cut the rest of the stream: most
    chunk payloads survive (the reason CDC exists); offset-addressed
    fixed chunking loses every fingerprint."""
    base = _rand(30_000, seed=3)
    shifted = b"INSERTED" + base

    def fps(d: bytes) -> set[bytes]:
        return {hashlib.sha256(c).digest() for c in cdc_chunks(d)}

    overlap = len(fps(base) & fps(shifted)) / len(fps(base))
    assert overlap > 0.9

    def fixed(d: bytes) -> set[bytes]:
        return {hashlib.sha256(d[i : i + 64]).digest() for i in range(0, len(d), 64)}

    assert len(fixed(base) & fixed(shifted)) == 0


def test_localized_edit_disturbs_only_neighboring_chunks():
    base = _rand(30_000, seed=5)
    arr = bytearray(base)
    arr[15_000] ^= 0xFF  # one-byte flip mid-stream
    edited = bytes(arr)
    a = {hashlib.sha256(c).digest() for c in cdc_chunks(base)}
    b = {hashlib.sha256(c).digest() for c in cdc_chunks(edited)}
    assert len(a & b) / len(a) > 0.95


def test_spark_chunk_table_bit_matches_oracle(spark):
    texts = [
        ("a" * 10, 0),
        ("x" * 5000, 1),
        ("", 2),
        (_rand(3000, seed=9).decode("latin-1"), 3),
    ]
    docs = spark.createDataFrame(
        [(i, t) for t, i in texts], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.seg_idx): (r.seg_len, bytes(r.chunk_fp))
        for r in cdc_chunk_table(docs).collect()
    }
    want = {}
    for t, i in texts:
        blob = t.encode("utf-8")
        start = 0
        for j, end in enumerate(cdc_boundaries_oracle(blob)):
            want[(i, j)] = (end - start, hashlib.sha256(blob[start:end]).digest()[:16])
            start = end
    assert got == want


def test_census_counts_planted_duplicate_region(spark):
    """Two docs sharing a long identical region (at different offsets)
    must share CDC chunks -> dedup_ratio > 1 and the chunk-table plan
    stays map-only (no Exchange before the fingerprint stage)."""
    shared = _rand(8_000, seed=11).decode("latin-1")
    docs = spark.createDataFrame(
        [
            (0, "PREAMBLE-A " + shared),
            (1, "B" * 137 + shared),
            (2, _rand(4_000, seed=12).decode("latin-1")),
        ],
        "doc_id long, text string",
    )
    row = cdc_chunk_census(docs).collect()[0]
    assert row.n_chunks > row.n_distinct_chunks
    assert row.dedup_ratio > 1.2
    assert row.total_bytes == sum(len(t.encode("utf-8")) for _, t in [
        (0, "PREAMBLE-A " + shared),
        (1, "B" * 137 + shared),
        (2, docs.collect()[2].text),
    ])
    plan = (
        cdc_chunk_table(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # map-only contract


def test_registry_query_runs_on_testdata(spark, sf_tiny):
    from hyrise_generalized_dedup_spark.dedup.queries import DEDUP_QUERIES

    row = DEDUP_QUERIES["cdc_chunk_census"](spark, sf_tiny).collect()[0]
    assert row.n_chunks >= row.n_distinct_chunks > 0
    assert row.dedup_ratio >= 1.0


def test_empty_and_tiny_inputs():
    assert cdc_boundaries(b"") == []
    assert cdc_chunks(b"z") == [b"z"]
    assert cdc_boundaries(b"q" * MIN_SIZE) == [MIN_SIZE]


def test_batch_gear_hashes_match_per_doc():
    """r6 batched kernel: one 64-pass sweep over the padded concat must
    reproduce gear_hashes per doc bit-for-bit (zero-pad isolation)."""
    import random

    import numpy as np

    from hyrise_generalized_dedup_spark.dedup.cdc import (
        _batch_gear_hashes,
        gear_hashes,
    )

    rng = random.Random(3)
    blobs = [
        b"",
        bytes([7]) * 5,
        bytes(rng.randrange(256) for _ in range(300)),
        bytes(rng.randrange(256) for _ in range(63)),
        bytes(rng.randrange(256) for _ in range(64)),
        bytes(rng.randrange(256) for _ in range(65)),
        bytes(rng.randrange(256) for _ in range(2048)),
    ]
    h_all, offs = _batch_gear_hashes(blobs)
    for blob, off in zip(blobs, offs):
        if not blob:
            continue
        ref = gear_hashes(np.frombuffer(blob, dtype=np.uint8))
        got = h_all[off : off + len(blob)]
        assert np.array_equal(got, ref), len(blob)
