"""DSIR importance resampling (functions/dsir.py) vs a plain-Python oracle.

The driver gate (text_dsir_weights in g_text_quality_langid) bit-checks
the integer count surface + lean vote against DuckDB; here the float
log_weight column is value-checked against a from-scratch Python
recomputation of the hashed-n-gram target/raw models, plus semantic and
determinism properties.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from hyrise_generalized_dedup_spark.functions.dsir import (
    DEFAULT_ALPHA,
    DEFAULT_BUCKETS,
    dsir_table,
    hashed_grams,
)

_DOCS = [
    # target half (even ids): English-ish prose over a shared vocabulary
    (0, "the cat sat on the mat and the cat ran"),
    (2, "the dog sat on the rug and the dog ran"),
    (4, "a bird sat on the wire and a bird sang"),
    (6, "the cat and the dog sat on the mat"),
    # raw-only half (odd ids)
    (1, "the cat sat on the mat"),               # target-like
    (3, "zq xv plorp glemf wubble snark forp"),  # off-target gibberish
    (5, ""),                                     # blank: 0 grams
    (7, "single"),                               # 1 token: 1 unigram
    (9, "the cat sat on a completely novel trampoline today"),
]


def _bucket(g: str, buckets: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % buckets


def _python_oracle(docs, buckets=DEFAULT_BUCKETS, alpha=DEFAULT_ALPHA):
    toks = {i: t.strip().lower().split() if t.strip() else [] for i, t in docs}
    grams = {
        i: w + [f"{a} {b}" for a, b in zip(w, w[1:])] for i, w in toks.items()
    }
    gb = {i: [_bucket(g, buckets) for g in gs] for i, gs in grams.items()}
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for i, bs in gb.items():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if i % 2 == 0:
                ct[b] = ct.get(b, 0) + 1
    nr = sum(cr.values())
    nt = sum(ct.values())
    out = {}
    for i, bs in gb.items():
        n_lean = sum(
            1
            for b in bs
            if float(ct.get(b, 0) + 1) * (nr + buckets)
            > float(cr[b] + 1) * (nt + buckets)
        )
        lw = (
            sum(
                math.log((ct.get(b, 0) + alpha) / (nt + alpha * buckets))
                - math.log((cr[b] + alpha) / (nr + alpha * buckets))
                for b in bs
            )
            if bs
            else None
        )
        out[i] = dict(
            n=len(bs),
            tc=sum(ct.get(b, 0) for b in bs),
            rc=sum(cr[b] for b in bs),
            lean=n_lean,
            keep=2 * n_lean >= len(bs),
            lw=lw,
        )
    return out


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    return {r["doc_id"]: r for r in dsir_table(docs).collect()}


def test_counts_and_log_weight_match_python_oracle(scored):
    exp = _python_oracle(_DOCS)
    assert set(scored) == set(exp)
    for i, e in exp.items():
        r = scored[i]
        assert r["dsir_n_grams"] == e["n"], i
        assert r["dsir_sum_tc"] == e["tc"], i
        assert r["dsir_sum_rc"] == e["rc"], i
        assert r["dsir_n_lean"] == e["lean"], i
        assert r["dsir_keep"] == e["keep"], i
        if e["lw"] is None:
            assert r["log_weight"] is None, i
        else:
            assert r["log_weight"] == pytest.approx(e["lw"], rel=1e-12), i


def test_gram_hash_matches_md5_prefix(spark):
    docs = spark.createDataFrame([(0, "alpha beta")], ["doc_id", "text"])
    got = sorted(r["bucket"] for r in hashed_grams(docs, buckets=1 << 20).collect())
    exp = sorted(_bucket(g, 1 << 20) for g in ["alpha", "beta", "alpha beta"])
    assert got == exp


def test_semantics_target_like_beats_off_target(scored):
    # Importance ORDERING is the semantic claim (absolute sign is dominated
    # by the alpha*buckets smoothing mass at toy scale): doc 1 repeats the
    # target half's grams, doc 9 is partly novel, doc 3's grams never occur
    # in the target slice at all (dsir_sum_tc == 0).
    assert scored[1]["log_weight"] > scored[9]["log_weight"] > scored[3]["log_weight"]
    assert scored[3]["dsir_sum_tc"] == 0 and not scored[3]["dsir_keep"]
    # Target-slice docs lean target under the vote by construction.
    assert scored[2]["dsir_keep"] and scored[4]["dsir_keep"]
    # Blank doc: vacuous keep, NULL weight, zero counts.
    assert scored[5]["dsir_n_grams"] == 0
    assert scored[5]["dsir_keep"] and scored[5]["log_weight"] is None


def test_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    a = {r["doc_id"]: r for r in dsir_table(docs).collect()}
    b = {
        r["doc_id"]: r
        for r in dsir_table(docs.repartition(7, "doc_id")).collect()
    }
    for i in a:
        ra, rb = a[i], b[i]
        for c in (
            "dsir_n_grams", "dsir_sum_tc", "dsir_sum_rc", "dsir_n_lean",
            "dsir_keep",
        ):
            assert ra[c] == rb[c]
        if ra["log_weight"] is None:
            assert rb["log_weight"] is None
        else:
            assert rb["log_weight"] == pytest.approx(ra["log_weight"], rel=1e-12)


def test_random_docs_with_planted_collisions_match_oracle(spark):
    """Seeded random corpus over a tiny vocabulary, hashed into only 16
    buckets so collisions are guaranteed — every count column, the lean
    vote, and the log weight must match the from-scratch model."""
    import random

    rng = random.Random(0xD51F)
    vocab = [f"t{i}" for i in range(10)]
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(50)
    ]
    exp = _python_oracle(corpus, buckets=16)
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in dsir_table(docs, buckets=16).collect()}
    assert len(rows) == len(corpus)
    for i, e in exp.items():
        r = rows[i]
        assert (
            r["dsir_n_grams"], r["dsir_sum_tc"], r["dsir_sum_rc"],
            r["dsir_n_lean"], r["dsir_keep"],
        ) == (e["n"], e["tc"], e["rc"], e["lean"], e["keep"]), i
        if e["lw"] is None:
            assert r["log_weight"] is None, i
        else:
            assert r["log_weight"] == pytest.approx(e["lw"], rel=1e-12), i
