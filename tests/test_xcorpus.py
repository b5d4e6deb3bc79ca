"""Cross-corpus fuzzy decontamination (dedup/xcorpus.py) vs a brute-force
oracle: exact soundness (reported counts bit-equal to set arithmetic),
recall on a planted corpus, determinism under repartitioning, degenerate
docs, rollup flags, and the broadcast plan shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hyrise_generalized_dedup_spark.config import GDConfig
from hyrise_generalized_dedup_spark.dedup.minhash import shingle_hashes
from hyrise_generalized_dedup_spark.dedup.xcorpus import (
    contamination_flags,
    fuzzy_pairs,
)

CFG = GDConfig()  # shingle_k=8, 128 hashes, 32 bands, threshold 0.7


def _mutate(text: str, every: int, rng: random.Random) -> str:
    chars = list(text)
    for i in range(0, len(chars), every):
        chars[i] = rng.choice("abcdefghijklmnopqrstuvwxyz")
    return "".join(chars)


def _mk_corpus():
    """Train/eval lists with planted exact copies, near-dups, and noise."""
    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz 0123456789"
    base = ["".join(rng.choice(alphabet) for _ in range(600)) for _ in range(8)]
    train = [(i, base[i]) for i in range(8)]
    # 100-199: unrelated noise docs
    train += [
        (100 + j, "".join(rng.choice(alphabet) for _ in range(500)))
        for j in range(30)
    ]
    ev = [
        (0, base[0]),                       # exact copy of train 0
        (1, _mutate(base[1], 120, rng)),    # light edit -> very high J
        (2, _mutate(base[2], 60, rng)),     # moderate edit -> high J
        (3, "".join(rng.choice(alphabet) for _ in range(550))),  # unrelated
    ]
    return train, ev


def _brute_pairs(train, ev, threshold_pm):
    out = {}
    for tk, tt in train:
        ts = set(shingle_hashes(tt.encode(), CFG.shingle_k).tolist())
        for ek, et in ev:
            es = set(shingle_hashes(et.encode(), CFG.shingle_k).tolist())
            inter, union = len(ts & es), len(ts | es)
            if union and 1000 * inter >= threshold_pm * union:
                out[(tk, ek)] = (inter, union, (1000 * inter) // union)
    return out


@pytest.fixture(scope="module")
def corpus_dfs(spark):
    train, ev = _mk_corpus()
    tdf = spark.createDataFrame(train, "train_id long, content string")
    edf = spark.createDataFrame(ev, "eval_id long, content string")
    return train, ev, tdf, edf


def _run(tdf, edf, threshold_pm):
    df = fuzzy_pairs(
        tdf, edf, CFG,
        train_key="train_id", eval_key="eval_id", threshold_pm=threshold_pm,
    )
    return {
        (r.train_id, r.eval_id): (r.inter_shingles, r.union_shingles, r.jaccard_pm)
        for r in df.collect()
    }


def test_matches_brute_force_exactly(corpus_dfs):
    train, ev, tdf, edf = corpus_dfs
    got = _run(tdf, edf, 700)
    want = _brute_pairs(train, ev, 700)
    # soundness AND recall in one shot: identical pair set, bit-equal counts
    assert got == want
    # the planted structure actually exercised all three cases
    assert got[(0, 0)][2] == 1000          # exact copy
    assert 700 <= got[(2, 2)][2] < 1000    # moderate edit
    assert (3, 3) not in got and (100, 3) not in got  # unrelated


def test_threshold_is_integer_exact(corpus_dfs):
    train, ev, tdf, edf = corpus_dfs
    # a tighter threshold must be exactly the brute-force subset
    got = _run(tdf, edf, 990)
    want = _brute_pairs(train, ev, 990)
    assert got == want
    assert (0, 0) in got  # exact copy survives any threshold


def test_deterministic_under_repartitioning(spark, corpus_dfs):
    _, _, tdf, edf = corpus_dfs
    a = sorted(_run(tdf.repartition(1), edf, 700).items())
    b = sorted(_run(tdf.repartition(7, "train_id"), edf, 700).items())
    assert a == b


def test_empty_eval_side(spark, corpus_dfs):
    _, _, tdf, edf = corpus_dfs
    assert _run(tdf, edf.where(F.lit(False)), 700) == {}


def test_degenerate_docs(spark):
    tdf = spark.createDataFrame(
        [(1, ""), (2, "abc"), (3, "abd")], "train_id long, content string"
    )
    edf = spark.createDataFrame(
        [(10, ""), (11, "abc")], "eval_id long, content string"
    )
    got = _run(tdf, edf, 700)
    # empty==empty J=1; short identical docs J=1; short near-miss absent
    assert got == {(1, 10): (1, 1, 1000), (2, 11): (1, 1, 1000)}


def test_contamination_flags_rollup(spark, corpus_dfs):
    train, ev, tdf, edf = corpus_dfs
    pairs = fuzzy_pairs(
        tdf, edf, CFG, train_key="train_id", eval_key="eval_id",
        threshold_pm=700,
    )
    flags = {r.train_id: (r.n_eval_matches, r.max_jaccard_pm)
             for r in contamination_flags(pairs, train_key="train_id").collect()}
    want = _brute_pairs(train, ev, 700)
    per_train = {}
    for (tk, _), (_, _, pm) in want.items():
        n, mx = per_train.get(tk, (0, 0))
        per_train[tk] = (n + 1, max(mx, pm))
    assert flags == per_train


def test_plan_broadcasts_eval_side(corpus_dfs):
    _, _, tdf, edf = corpus_dfs
    df = fuzzy_pairs(
        tdf, edf, CFG, train_key="train_id", eval_key="eval_id",
        threshold_pm=700,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_registered_query_matches_duckdb(spark, sf_tiny):
    """The driver-gated surface (text_fuzzy_decontaminate) vs its DuckDB
    brute-force twin — the same comparison the driver performs."""
    from hyrise_generalized_dedup_spark.dedup.queries import (
        DEDUP_ORACLES,
        DEDUP_QUERIES,
    )
    from hyrise_generalized_dedup_spark.testing import compare_to_duckdb

    df = DEDUP_QUERIES["text_fuzzy_decontaminate"](spark, sf_tiny)
    ok, msg = compare_to_duckdb(
        df, DEDUP_ORACLES["text_fuzzy_decontaminate"], sf_tiny
    )
    assert ok, msg


def test_decontaminate_source_on_synth(spark):
    """Pipeline pre-filter: eval = a subset of the synth corpus, so every
    eval doc's source twin (exact copy, J=1000) must be dropped, along
    with its byte-identical dup-group members; clean docs survive."""
    from hyrise_generalized_dedup_spark.dedup.xcorpus import decontaminate_source
    from hyrise_generalized_dedup_spark.synth import generate, to_spark

    corpus = generate(n_rows=300)
    source = to_spark(spark, corpus)
    ev = source.limit(40)
    filtered, summary = decontaminate_source(source, ev, CFG, threshold_pm=800)
    kept = filtered.count()
    assert summary["n_eval_docs"] == 40
    assert summary["n_contaminated_dropped"] >= 40  # the 40 twins at least
    assert kept == 300 - summary["n_contaminated_dropped"]
    # no eval twin survives: anti-join the kept set against eval commits
    ev_commits = {r.commit for r in ev.collect()}
    survivors = {r.commit for r in filtered.collect()}
    assert not (ev_commits & survivors)
    # schema is unchanged (the helper's key column must not leak)
    assert filtered.columns == source.columns
