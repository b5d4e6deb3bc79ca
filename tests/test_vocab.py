"""Vocabulary census + BPE pair statistics (functions/vocab.py) vs a
pure-python mirror, plus DuckDB parity for the registered queries."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from hyrise_generalized_dedup_spark.functions.queries import (
    TEXT_ORACLES,
    TEXT_QUERIES,
)
from hyrise_generalized_dedup_spark.functions.vocab import (
    TOKEN_RE,
    bpe_pair_stats,
    vocab_census,
)
from hyrise_generalized_dedup_spark.testing import compare_to_duckdb

DOCS = [
    (0, "Spark spark SPARK join"),
    (1, "join the fast_scan v2 a"),
    (2, ""),
    (3, "a b a b7 __x"),
    (4, "hash-join hash.join"),
]


def _mirror():
    docs_per = defaultdict(set)
    occ = Counter()
    for i, text in DOCS:
        for tok in re.findall(TOKEN_RE, text.lower()):
            docs_per[tok].add(i)
            occ[tok] += 1
    vocab = {t: (len(docs_per[t]), occ[t]) for t in occ}
    pair_occ = Counter()
    pair_forms = Counter()
    for t, (_nd, n) in vocab.items():
        for i in range(len(t) - 1):
            pair_occ[t[i : i + 2]] += n
            pair_forms[t[i : i + 2]] += 1
    return vocab, pair_occ, pair_forms


def test_vocab_census_matches_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab, _, _ = _mirror()
    got = {
        r["token"]: (r["n_docs"], r["n_occurrences"])
        for r in vocab_census(df).collect()
    }
    assert got == vocab
    assert got["spark"] == (1, 3)  # casing folds
    assert got["join"] == (3, 4)  # punctuation splits hash-join / hash.join
    assert got["a"] == (2, 3)  # single-char token counted
    assert "" not in got


def test_min_docs_threshold(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["token"] for r in vocab_census(df, min_docs=2).collect()}
    assert got == {"join", "a"}


def test_bpe_pairs_match_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    _, pair_occ, pair_forms = _mirror()
    got = {
        r["pair"]: (r["n_occurrences"], r["n_token_forms"])
        for r in bpe_pair_stats(df).collect()
    }
    assert got == {p: (pair_occ[p], pair_forms[p]) for p in pair_occ}
    # single-char tokens ('a', 'b') contribute no pairs
    assert all(len(p) == 2 for p in got)
    # the BPE argmax on this fixture: 'jo'/'oi'/'in' carry join's 4 + none
    assert got["jo"] == (4, 1)


def test_registered_vocab_queries_match_duckdb(spark, sf_tiny):
    for name in ("text_vocab_census", "bpe_pair_stats"):
        df = TEXT_QUERIES[name](spark, sf_tiny)
        ok, msg = compare_to_duckdb(df, TEXT_ORACLES[name], sf_tiny)
        assert ok, f"{name}: {msg}"


def test_corpus_shuffle_is_a_permutation(spark, sf_tiny):
    """Every doc appears exactly once; ranks are 1..n per bucket; the
    order is reproducible and partitioning-invariant."""
    from hyrise_generalized_dedup_spark.functions.shuffle import shuffle_order
    from hyrise_generalized_dedup_spark.sources.tables import load_table

    docs = load_table(spark, sf_tiny, "documents")
    out = shuffle_order(docs).collect()
    assert len(out) == len({r["doc_id"] for r in out}) == docs.count()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["rank_in_bucket"])
    for b, ranks in by_bucket.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), b
    # reproducible across repartitionings
    again = shuffle_order(docs.repartition(7)).collect()
    assert {(r["doc_id"], r["bucket"], r["rank_in_bucket"]) for r in again} == {
        (r["doc_id"], r["bucket"], r["rank_in_bucket"]) for r in out
    }
    # a different seed produces a different order
    other = shuffle_order(docs, seed="other").collect()
    assert {(r["doc_id"], r["rank_in_bucket"]) for r in other} != {
        (r["doc_id"], r["rank_in_bucket"]) for r in out
    }


def test_corpus_shuffle_matches_duckdb(spark, sf_tiny):
    df = TEXT_QUERIES["corpus_shuffle"](spark, sf_tiny)
    ok, msg = compare_to_duckdb(df, TEXT_ORACLES["corpus_shuffle"], sf_tiny)
    assert ok, msg
