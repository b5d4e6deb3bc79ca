"""BPE training + distributed application (functions/bpe.py).

No SQL oracle exists (iterative merging is not SQL-expressible), so the
correctness evidence is algebraic: the rank-greedy encoder must agree
with an INDEPENDENT sequential replay of the merge list on every word,
subwords must reconstruct the word, token counts must be non-increasing
in n_merges, and the Spark table must match a from-scratch Python
recomputation per document under any partitioning.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from hyrise_generalized_dedup_spark.functions.bpe import (
    bpe_encode_table,
    bpe_pipeline,
    encode_word,
    train_bpe,
    train_bpe_from_census,
)
from hyrise_generalized_dedup_spark.functions.vocab import TOKEN_RE, vocab_census


def _replay(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference encoder: apply each merge in training order,
    left to right, everywhere — the literal Sennrich inference rule."""
    syms = list(word)
    for a, b in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [a + b]
            else:
                i += 1
    return syms


def test_train_bpe_classic_example():
    # Sennrich et al. running example: 'es' (9 weighted) merges first,
    # then 'es'+'t' -> 'est'.
    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(vocab, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_train_bpe_deterministic_tiebreak():
    # equal counts -> lexicographically smallest pair wins
    merges = train_bpe([("ab", 3), ("cd", 3)], 1)
    assert merges == [("a", "b")]


def test_encoder_agrees_with_sequential_replay():
    import random

    rng = random.Random(0xB9E)
    alpha = "abcde"
    vocab = {}
    for _ in range(200):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        vocab[w] = vocab.get(w, 0) + rng.randint(1, 9)
    merges = train_bpe(sorted(vocab.items()), 40)
    ranks = {p: i for i, p in enumerate(merges)}
    probe = list(vocab) + ["aaaa", "abcabc", "zzz", "a", ""]
    for w in probe:
        got = encode_word(w, ranks)
        assert got == _replay(w, merges), w
        assert "".join(got) == w, w  # reconstruction


def test_token_count_monotone_in_merges():
    vocab = [("banana", 4), ("bandana", 2), ("cabana", 3)]
    prev = None
    for k in (0, 1, 2, 4, 8):
        merges = train_bpe(vocab, k)
        ranks = {p: i for i, p in enumerate(merges)}
        total = sum(len(encode_word(w, ranks)) * c for w, c in vocab)
        if prev is not None:
            assert total <= prev
        prev = total
    # enough merges -> every trained word becomes one token
    merges = train_bpe(vocab, 100)
    ranks = {p: i for i, p in enumerate(merges)}
    assert all(len(encode_word(w, ranks)) == 1 for w, _ in vocab)


_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the the the banana bandana cabana"),
    (2, ""),
    (3, "Mixed CASE Words and_under_scores plus123 numbers"),
    (4, "unseen zyxwvu qqqq"),
]


@pytest.fixture(scope="module")
def trained(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    merges, table = bpe_pipeline(docs, n_merges=24, max_vocab=1000)
    return docs, merges, {r["doc_id"]: r for r in table.collect()}


def test_spark_table_matches_python_recomputation(trained):
    _, merges, rows = trained
    ranks = {p: i for i, p in enumerate(merges)}
    token_re = re.compile(TOKEN_RE)
    mod = (1 << 61) - 1
    for doc_id, text in _DOCS:
        words = token_re.findall(text.lower())
        n_tok, sig = 0, 0
        for w in words:
            subs = encode_word(w, ranks)
            n_tok += len(subs)
            for s in subs:
                sig = (sig + int(hashlib.md5(s.encode()).hexdigest()[:12], 16)) % mod
        r = rows[doc_id]
        assert r["n_words"] == len(words), doc_id
        assert r["n_bpe_tokens"] == n_tok, doc_id
        assert r["bpe_sig"] == sig, doc_id


def test_encode_table_partitioning_invariant(spark, trained):
    docs, merges, rows = trained
    again = {
        r["doc_id"]: r
        for r in bpe_encode_table(docs.repartition(5, "doc_id"), merges).collect()
    }
    for i, r in rows.items():
        assert (r["n_words"], r["n_bpe_tokens"], r["bpe_sig"]) == (
            again[i]["n_words"], again[i]["n_bpe_tokens"], again[i]["bpe_sig"]
        )


def test_census_cap_is_the_only_collect(spark):
    docs = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    census = vocab_census(docs)
    merges = train_bpe_from_census(census, n_merges=8, max_vocab=5)
    # cap honored: merges only involve symbols from the top-5 words
    assert len(merges) <= 8 and all(len(p) == 2 for p in merges)


def test_null_text_rows_encode_as_empty(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    docs = spark.createDataFrame([(0, "alpha beta"), (1, None)], schema)
    merges = train_bpe([("alpha", 2), ("beta", 1)], 4)
    rows = {r["doc_id"]: r for r in bpe_encode_table(docs, merges).collect()}
    assert rows[1]["n_words"] == 0
    assert rows[1]["n_bpe_tokens"] == 0 and rows[1]["bpe_sig"] == 0
    assert rows[0]["n_words"] == 2
