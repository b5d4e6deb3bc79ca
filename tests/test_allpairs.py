"""Exact all-pairs Jaccard join (dedup/allpairs.py).

Oracle: brute-force set Jaccard over every pair in Python — the prefix
filter must lose nothing and invent nothing at any threshold.
"""

from __future__ import annotations

import itertools
import random

from hyrise_generalized_dedup_spark.dedup.allpairs import (
    all_pairs_jaccard,
    token_sets,
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )


def _brute(texts, pm):
    sets = {i: set(t.split()) - {""} for i, t in enumerate(texts)}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if 1000 * inter >= pm * union:
            out[(a, b)] = (inter, union, (1000 * inter) // union)
    return out


def _spark_pairs(spark, texts, pm):
    rows = all_pairs_jaccard(_docs_df(spark, texts), threshold_pm=pm).collect()
    return {
        (r["doc_a"], r["doc_b"]): (
            r["inter_tokens"], r["union_tokens"], r["jaccard_pm"],
        )
        for r in rows
    }


def test_matches_bruteforce_random_corpus(spark):
    rnd = random.Random(31)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rnd.choices(vocab, k=rnd.randint(3, 25))) for _ in range(80)
    ]
    for pm in (400, 700, 900):
        assert _spark_pairs(spark, texts, pm) == _brute(texts, pm), pm


def test_planted_near_duplicates_found(spark):
    base = " ".join(f"tok{i}" for i in range(20))
    texts = [base, base + " extra", "completely different words here", base]
    got = _spark_pairs(spark, texts, 900)
    assert (0, 3) in got and got[(0, 3)] == (20, 20, 1000)
    assert (0, 1) in got and got[(0, 1)][2] == (1000 * 20) // 21
    assert all(2 not in pair for pair in got)


def test_threshold_1000_means_identical_sets(spark):
    texts = ["a b c", "c b a a", "a b", "b a c"]
    got = _spark_pairs(spark, texts, 1000)
    # duplicated tokens collapse: {a,b,c} == {a,b,c}
    assert set(got) == {(0, 1), (0, 3), (1, 3)}
    assert all(v == (3, 3, 1000) for v in got.values())


def test_empty_and_whitespace_docs_ignored(spark):
    texts = ["", "   ", "a b c", "a b c"]
    got = _spark_pairs(spark, texts, 500)
    assert set(got) == {(2, 3)}


def test_token_sets_distinct_and_nonempty(spark):
    df = _docs_df(spark, ["x x  y", " "])
    rows = {(r["doc_id"], r["tk"]) for r in token_sets(df).collect()}
    assert rows == {(0, "x"), (0, "y")}


def test_prefix_completeness_against_unfiltered_verify(spark):
    """Every pair the exact verifier would accept survives the prefix
    filter — checked by comparing against brute force on a corpus built
    to stress the filter (heavy shared-stopword tails, varied sizes)."""
    rnd = random.Random(7)
    stop = "the of and to in is it"
    texts = []
    for _ in range(60):
        rare = " ".join(f"r{rnd.randint(0, 200)}" for _ in range(rnd.randint(1, 6)))
        texts.append((stop + " " + rare).strip())
    for pm in (500, 800):
        assert _spark_pairs(spark, texts, pm) == _brute(texts, pm), pm


def test_plan_is_jvm_only_no_cartesian(spark):
    df = _docs_df(spark, ["a b c", "a b d", "e f g"])
    plan = (
        all_pairs_jaccard(df, 700)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "Python" not in plan and "mapInPandas" not in plan
