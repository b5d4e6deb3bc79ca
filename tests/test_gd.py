"""GD transform correctness — encode/decode round-trip (the reference's
encoding round-trip test pattern, encoded_segment_test.cpp:161-290:
edge-case pool x every encoding config, element-wise equality)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hyrise_generalized_dedup_spark.config import GDConfig
from hyrise_generalized_dedup_spark.dedup.gd import (
    decode_segments,
    encode_segments,
    gd_segments,
)

EDGE_CONTENTS = [
    b"",
    b"a",
    b"x" * 64,            # exactly chunk_size
    b"x" * 63,
    b"x" * 65,
    b"ab" * 1000,
    "héllo wörld — ünïcode ✓ 中文 🚀".encode(),
    bytes(range(256)) * 3,
    b"\x00" * 100,
    b"\xff" * 100,
]

CONFIGS = [
    GDConfig(),                                        # lowbits canonical
    GDConfig(gd_mode="lowbits", chunk_size=16, dev_bits=4),
    GDConfig(gd_mode="lowbits", chunk_size=64, dev_bits=1),
    GDConfig(gd_mode="prefix", chunk_size=64, dev_bytes=8),
    GDConfig(gd_mode="prefix", chunk_size=32, dev_bytes=1),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: f"{c.gd_mode}-{c.chunk_size}-{c.dev_bits}-{c.dev_bytes}")
@pytest.mark.parametrize("content", EDGE_CONTENTS, ids=range(len(EDGE_CONTENTS)))
def test_roundtrip_edge_cases(cfg, content):
    segs = encode_segments(content, cfg)
    decoded = decode_segments([(i, b, d) for i, b, _, d in segs], cfg, len(content))
    assert decoded == content


@given(st.binary(max_size=2000), st.sampled_from(CONFIGS))
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(content, cfg):
    segs = encode_segments(content, cfg)
    decoded = decode_segments([(i, b, d) for i, b, _, d in segs], cfg, len(content))
    assert decoded == content


def test_identical_segments_share_base():
    cfg = GDConfig()
    content = b"A" * 64 * 5  # five identical segments
    segs = encode_segments(content, cfg)
    fps = {fp for _, _, fp, _ in segs}
    assert len(segs) == 5 and len(fps) == 1


def test_lowbit_variants_share_base():
    """Two segments differing only in the low dev_bits of each byte dedupe
    to one base — the 'generalized' in generalized dedup."""
    cfg = GDConfig(dev_bits=2)
    a = bytes([0b10101000] * 64)
    b = bytes([0b10101011] * 64)  # same high 6 bits, different low 2
    fp_a = encode_segments(a, cfg)[0][2]
    fp_b = encode_segments(b, cfg)[0][2]
    assert fp_a == fp_b
    # but round-trips stay distinct
    sa = encode_segments(a, cfg)
    sb = encode_segments(b, cfg)
    assert decode_segments([(i, x, d) for i, x, _, d in sa], cfg, 64) == a
    assert decode_segments([(i, x, d) for i, x, _, d in sb], cfg, 64) == b


def test_base_fp_is_truncated_sha256():
    cfg = GDConfig(gd_mode="prefix", chunk_size=64, dev_bytes=8)
    content = b"q" * 64
    _, base, fp, dev = encode_segments(content, cfg)[0]
    assert base == b"q" * 56 and dev == b"q" * 8
    assert fp == hashlib.sha256(base).digest()[:16]


def test_spark_stage_matches_oracle(spark):
    """Distributed mapInPandas output == pure-Python oracle, row for row
    (the JoinVerification pattern, join_verification.hpp:7-11)."""
    cfg = GDConfig()  # lowbits — the mode the SQL oracle can't check
    rows = [
        ("r0", "a.py", "c0", "py", "def f():\n    return 42\n" * 10),
        ("r1", "b.py", "c1", "py", ""),
        ("r2", "c.md", "c2", "md", "héllo 中文 🚀 " * 50),
        ("r3", "d.py", "c3", "py", "def f():\n    return 42\n" * 10),  # exact dup of r0
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    got = {
        (r.repo, r.seg_idx): (bytes(r.base_fp), bytes(r.deviation), r.seg_len)
        for r in gd_segments(df, cfg).collect()
    }
    expected = {}
    for repo, _, _, _, content in rows:
        blob = content.encode()
        for idx, _, fp, dev in encode_segments(blob, cfg):
            expected[(repo, idx)] = (fp, dev, min(cfg.chunk_size, len(blob) - idx * cfg.chunk_size))
    assert got == expected
    # exact duplicates share every base fingerprint
    r0 = sorted(v[0] for (k, i), v in got.items() if k == "r0")
    r3 = sorted(v[0] for (k, i), v in got.items() if k == "r3")
    assert r0 == r3


def test_config_hash_changes_with_config():
    assert GDConfig().config_hash() != GDConfig(chunk_size=128).config_hash()
    assert GDConfig().config_hash() == GDConfig().config_hash()
