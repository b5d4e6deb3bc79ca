"""Bigram-LM perplexity filter (functions/lm.py) vs a plain-Python oracle.

The driver gate (text_lm_scores in g_text_stats) bit-checks the integer
count surface against DuckDB; here the float cross-entropy / perplexity
columns are value-checked against a from-scratch Python recomputation of
the add-alpha bigram model, plus semantic and determinism properties.
"""

from __future__ import annotations

import math

import pytest

from hyrise_generalized_dedup_spark.functions.lm import (
    OOV_KEEP_DEN,
    OOV_KEEP_NUM,
    lm_score_table,
)

_DOCS = [
    # reference half (even ids): plain repetitive English-ish prose
    (0, "the cat sat on the mat and the cat ran"),
    (2, "the dog sat on the rug and the dog ran"),
    (4, "a bird sat on the wire and a bird sang"),
    (6, "the cat and the dog sat on the mat"),
    # held-out half (odd ids)
    (1, "the cat sat on the mat"),              # in-model: low perplexity
    (3, "zq xv plorp glemf wubble snark forp"), # all-OOV gibberish
    (5, ""),                                     # blank: 0 bigrams
    (7, "single"),                               # 1 token: 0 bigrams
    (9, "the cat sat on a completely novel trampoline today"),
]

_ALPHA = 0.5


def _python_oracle():
    """Recompute the model + scores with dicts and math.log."""
    toks = {i: t.strip().lower().split() if t.strip() else [] for i, t in _DOCS}
    bigrams = {i: list(zip(w, w[1:])) for i, w in toks.items()}
    c2: dict[tuple[str, str], int] = {}
    for i, bg in bigrams.items():
        if i % 2 == 0:
            for p in bg:
                c2[p] = c2.get(p, 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c
    v = len({w2 for _, w2 in c2}) + 1
    out = {}
    for i, bg in bigrams.items():
        if not bg:
            out[i] = dict(n=0, oov=0, sp=0, sc=0, ce=None)
            continue
        ce = -sum(
            math.log((c2.get(p, 0) + _ALPHA) / (c1.get(p[0], 0) + _ALPHA * v))
            for p in bg
        ) / len(bg)
        out[i] = dict(
            n=len(bg),
            oov=sum(1 for p in bg if p not in c2),
            sp=sum(c2.get(p, 0) for p in bg),
            sc=sum(c1.get(p[0], 0) for p in bg),
            ce=ce,
        )
    return out


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    rows = lm_score_table(docs, alpha=_ALPHA).collect()
    return {r["doc_id"]: r for r in rows}


def test_counts_and_cross_entropy_match_python_oracle(scored):
    exp = _python_oracle()
    assert set(scored) == set(exp)
    for i, e in exp.items():
        r = scored[i]
        assert r["n_bigrams"] == e["n"], i
        assert r["n_oov_bigrams"] == e["oov"], i
        assert r["sum_pair_c"] == e["sp"], i
        assert r["sum_ctx_c"] == e["sc"], i
        if e["ce"] is None:
            assert r["cross_entropy"] is None and r["perplexity"] is None
        else:
            assert r["cross_entropy"] == pytest.approx(e["ce"], rel=1e-12), i
            assert r["perplexity"] == pytest.approx(math.exp(e["ce"]), rel=1e-12)


def test_keep_rule_matches_integer_threshold(scored):
    for r in scored.values():
        assert r["lm_keep"] == (
            r["n_oov_bigrams"] * OOV_KEEP_DEN <= r["n_bigrams"] * OOV_KEEP_NUM
        )


def test_semantics_in_model_beats_gibberish(scored):
    # Doc 1 is a substring of reference doc 0 -> every bigram in-model.
    assert scored[1]["n_oov_bigrams"] == 0 and scored[1]["lm_keep"]
    # Doc 3 is gibberish -> every bigram OOV, dropped, max perplexity.
    assert scored[3]["n_oov_bigrams"] == scored[3]["n_bigrams"]
    assert not scored[3]["lm_keep"]
    assert scored[3]["perplexity"] > scored[1]["perplexity"]
    # Blank / single-token docs: vacuous keep, NULL score.
    for i in (5, 7):
        assert scored[i]["n_bigrams"] == 0 and scored[i]["lm_keep"]
        assert scored[i]["cross_entropy"] is None


def test_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    a = {r["doc_id"]: r for r in lm_score_table(docs).collect()}
    b = {
        r["doc_id"]: r
        for r in lm_score_table(docs.repartition(7, "doc_id")).collect()
    }
    # Integer surface is bit-identical by construction; the per-doc float
    # is a mean over < 2^53-bounded term counts whose summation order
    # within a doc group can differ, so allow ULP-level tolerance.
    for i in a:
        ra, rb = a[i], b[i]
        for c in ("n_bigrams", "n_oov_bigrams", "sum_pair_c", "sum_ctx_c", "lm_keep"):
            assert ra[c] == rb[c]
        if ra["cross_entropy"] is None:
            assert rb["cross_entropy"] is None
        else:
            assert rb["cross_entropy"] == pytest.approx(ra["cross_entropy"], rel=1e-12)


def test_lm_random_docs_match_python_oracle(spark):
    """Hypothesis-style randomized check (seeded, deterministic corpus):
    documents drawn from a tiny vocabulary so bigrams collide heavily —
    every count column and the cross-entropy must match the from-scratch
    Python model on all docs."""
    import random

    rng = random.Random(0xC0FFEE)
    vocab = [f"t{i}" for i in range(12)]
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(60)
    ]
    toks = {i: t.split() for i, t in corpus}
    bigrams = {i: list(zip(w, w[1:])) for i, w in toks.items()}
    c2: dict[tuple[str, str], int] = {}
    for i, bg in bigrams.items():
        if i % 2 == 0:
            for p in bg:
                c2[p] = c2.get(p, 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c
    v = len({w2 for _, w2 in c2}) + 1

    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in lm_score_table(docs, alpha=0.5).collect()}
    assert len(rows) == len(corpus)
    for i, bg in bigrams.items():
        r = rows[i]
        assert r["n_bigrams"] == len(bg), i
        assert r["n_oov_bigrams"] == sum(1 for p in bg if p not in c2), i
        assert r["sum_pair_c"] == sum(c2.get(p, 0) for p in bg), i
        assert r["sum_ctx_c"] == sum(c1.get(p[0], 0) for p in bg), i
        if bg:
            ce = -sum(
                math.log((c2.get(p, 0) + 0.5) / (c1.get(p[0], 0) + 0.5 * v))
                for p in bg
            ) / len(bg)
            assert r["cross_entropy"] == pytest.approx(ce, rel=1e-12), i
