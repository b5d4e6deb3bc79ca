"""Suffix-array kernel + stage tests (brute-force substring oracle)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.config import GDConfig
from hyrise_generalized_dedup_spark.dedup.suffix import (
    build_suffix_array,
    shared_substring_pairs,
    suffix_edges,
)


def test_suffix_array_correct():
    s = np.frombuffer(b"banana", np.uint8)
    sa = build_suffix_array(s).tolist()
    # suffixes sorted: a, ana, anana, banana, na, nana -> offsets 5,3,1,0,4,2
    assert sa == [5, 3, 1, 0, 4, 2]


def test_suffix_array_random_matches_naive():
    rng = np.random.default_rng(42)
    for n in (1, 2, 17, 200):
        s = rng.integers(0, 5, size=n).astype(np.uint8)
        sa = build_suffix_array(s).tolist()
        naive = sorted(range(n), key=lambda i: bytes(s[i:]))
        assert sa == naive, f"n={n}"


def test_shared_substring_found():
    block = b"SHARED" * 50  # 300 bytes
    docs = [
        ("a", b"aaa-unique-prefix" + block + b"unique-suffix-a"),
        ("b", b"bbb-other-content" + block + b"tail-b"),
        ("c", b"no overlap at all here, completely different text " * 10),
    ]
    found = shared_substring_pairs(docs, min_len=256)
    pairs = {(a, b) for a, b, _ in found}
    assert ("a", "b") in pairs
    assert all("c" not in p for p in pairs)
    ln = next(l for a, b, l in found if (a, b) == ("a", "b"))
    assert ln >= 256


def test_lcp_never_crosses_document_boundary():
    """Regression: all doc sentinels are the same 0x00 byte, so an uncapped
    LCP compare ran past a sentinel and matched the NEXT document's content,
    emitting false pairs. Docs A and C share only 'hello' (5 bytes) but the
    A-buffer continues 'WORLD...' exactly like the C-buffer — min_len=10
    must therefore find nothing between A and C."""
    docs = [
        ("A", b"hello"),
        ("B", b"WORLD" * 3),
        ("C", b"hello"),
        ("D", b"WORLD" * 3),
    ]
    found = shared_substring_pairs(docs, min_len=10)
    assert all({a, b} != {"A", "C"} for a, b, _ in found), found
    # The genuinely-shared WORLDx3 pair must still be found (shared_len is
    # a >=min_len lower bound, so only >=10 is guaranteed).
    assert any({a, b} == {"B", "D"} and l >= 10 for a, b, l in found), found


def test_shared_len_capped_at_shortest_doc():
    """shared_len can never exceed the shorter document's length."""
    docs = [("x", b"abcabcabc"), ("y", b"abcabcabcabcabcabcabcabc")]
    found = shared_substring_pairs(docs, min_len=5)
    assert found, "9-byte shared prefix must be found"
    for _, _, l in found:
        assert l <= 9, f"shared_len {l} exceeds shortest doc (9 bytes)"


def test_no_false_positives_below_min_len():
    docs = [("a", b"x" * 100 + b"common" + b"y" * 100), ("b", b"z" * 100 + b"common" + b"w" * 100)]
    assert shared_substring_pairs(docs, min_len=50) == set()


def test_suffix_stage_on_spark(spark):
    cfg = GDConfig(suffix_min_len=100)
    block = "B" * 64 * 4  # 4x chunk_size shared block (FIXTURES tier 4)
    rows = [
        ("k1", "pre-" * 30 + block + "-post1", "c0"),
        ("k2", "other-" * 25 + block + "-post2", "c0"),
        ("k3", "unrelated text " * 40, "c0"),
        ("k4", "solo cluster " * 40, "c1"),
    ]
    df = spark.createDataFrame(rows, "doc_key string, content string, cluster_id string")
    edges = suffix_edges(df, cfg).collect()
    pairs = {(r.key_a, r.key_b) for r in edges if r.source == "suffix"}
    assert ("k1", "k2") in pairs
    assert not any("k4" in p for p in pairs)


def test_suffix_overflow_marker(spark):
    cfg = GDConfig(suffix_min_len=100, suffix_max_cluster=3)
    rows = [(f"k{i}", "content " * 50, "c0") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_key string, content string, cluster_id string")
    edges = suffix_edges(df, cfg).collect()
    assert any(r.source == "suffix_overflow" for r in edges), "cap must be visible, not silent"


def _brute_lcs_len(a: bytes, b: bytes) -> int:
    """Longest common substring length by substring-set intersection."""
    best = 0
    subs = {a[i:j] for i in range(len(a)) for j in range(i + 1, len(a) + 1)}
    for i in range(len(b)):
        for j in range(i + 1 + best, len(b) + 1):
            if b[i:j] in subs:
                best = j - i
    return best


def test_suffix_pairs_sound_and_complete_property():
    """Property (hypothesis): against a brute-force longest-common-substring
    oracle, shared_substring_pairs is SOUND (every emitted (a,b,l) pair
    really shares >= l bytes) and COMPLETE (every pair sharing >= min_len
    bytes is emitted) — including doc-boundary adversaries, since the
    generator plants shared blocks at document edges."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blocks = st.binary(min_size=0, max_size=12)
    shared = st.binary(min_size=8, max_size=16)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(blocks, min_size=2, max_size=5),
        shared,
        st.data(),
    )
    def prop(noise, block, data):
        docs = []
        for i, nz in enumerate(noise):
            # some docs embed the shared block (possibly at the edges),
            # others are pure noise
            if data.draw(st.booleans(), label=f"embed{i}"):
                pos = data.draw(st.integers(0, len(nz)), label=f"pos{i}")
                content = nz[:pos] + block + nz[pos:]
            else:
                content = nz
            docs.append((f"d{i}", content))
        min_len = 8
        found = shared_substring_pairs(docs, min_len)
        by_key = dict(zip([k for k, _ in docs], [c for _, c in docs]))
        # soundness: emitted length never exceeds the true LCS
        for a, b, l in found:
            assert _brute_lcs_len(by_key[a], by_key[b]) >= l >= min_len, (a, b, l)
        # completeness: every >=min_len-sharing pair is found
        keys = [k for k, _ in docs]
        emitted = {(a, b) for a, b, _ in found}
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                if _brute_lcs_len(by_key[keys[i]], by_key[keys[j]]) >= min_len:
                    pair = (min(keys[i], keys[j]), max(keys[i], keys[j]))
                    assert pair in emitted, (pair, by_key[keys[i]], by_key[keys[j]])

    prop()
