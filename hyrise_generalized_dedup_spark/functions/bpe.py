"""BPE tokenizer: full merge training + distributed application.

Closes the loop vocab.py opens (corpus vocabulary census + iteration-#1
pair statistics): train the complete merge table and encode the corpus
with it. Spark-first split of the published algorithm (Sennrich et al.,
ACL 2016):

- TRAINING needs only word-level counts, never the corpus: every pair
  statistic is a sum over the (word, n_occurrences) census, which
  ``vocab.vocab_census`` computes with one vocabulary-bounded groupBy.
  The census (capped at ``max_vocab`` rows by occurrence count — the
  same bounded-collect pattern as the IVF k-means training sample) is
  collected and the merge loop runs driver-side in numpy-free pure
  Python; its cost is O(n_merges · vocab), independent of corpus size.
- APPLICATION is the corpus-scale part and runs distributed: a
  ``mapInPandas`` batch encoder with a per-batch word memo (corpora are
  Zipfian — most occurrences hit the memo), broadcasting only the merge
  rank table (n_merges entries).

Correctness is pytest-oracled through an algebraic invariant rather
than a DuckDB oracle (iterative merging is not SQL-expressible): the
rank-greedy encoder must reproduce, for every trained word, the exact
segmentation the training loop's sequential replay produced — two
independent code paths, one answer — plus reconstruction (subwords
concatenate back to the word) and monotonicity (token count is
non-increasing in n_merges) properties. See tests/test_bpe.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .vocab import TOKEN_RE, vocab_census

# Bounded driver-side training sample (top words by occurrence count;
# deterministic tie-break on the word itself).
DEFAULT_MAX_VOCAB = 50_000


def train_bpe(
    vocab: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from (word, count) pairs.

    Classic weighted-pair argmax with a deterministic tie-break
    (max count, then lexicographically smallest pair) so the merge
    table is reproducible across runs and platforms. Returns fewer
    merges if the vocabulary exhausts (no adjacent pair left)."""
    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in vocab if len(w) >= 2
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge table: repeatedly apply the
    LOWEST-RANK applicable merge (leftmost occurrence first) until none
    applies — the standard BPE inference rule, which reproduces the
    training segmentation exactly for every word the trainer saw."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe_from_census(
    census: DataFrame, n_merges: int, max_vocab: int = DEFAULT_MAX_VOCAB
) -> list[tuple[str, str]]:
    """Collect the capped vocabulary census (the ONLY collect in the BPE
    path, max_vocab rows) and train the merge table driver-side."""
    top = (
        census.orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(max_vocab)
        .select("token", "n_occurrences")
        .collect()
    )
    return train_bpe([(r["token"], r["n_occurrences"]) for r in top], n_merges)


def _word_hash(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def bpe_encode_table(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE encode: one row per document with

    - ``n_words``      BIGINT  regex word tokens (vocab.TOKEN_RE)
    - ``n_bpe_tokens`` BIGINT  subword count under the merge table
    - ``bpe_sig``      BIGINT  order-independent signature: sum of the
                               48-bit md5 hashes of every emitted subword
                               (mod 2^61), partitioning-invariant

    Arrow-batched mapInPandas with a per-batch word->encoding memo; the
    merge table rides the closure (n_merges entries). Content never
    shuffles — per-file map work, the shape that holds at 10^12 files."""
    import re as _re

    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}
    token_re = _re.compile(TOKEN_RE)
    mod = (1 << 61) - 1

    out_schema = "doc_id long, n_words long, n_bpe_tokens long, bpe_sig long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[int, int]] = {}

        def enc(word: str) -> tuple[int, int]:
            got = memo.get(word)
            if got is None:
                subs = encode_word(word, ranks)
                got = (len(subs), sum(_word_hash(s) for s in subs) % mod)
                memo[word] = got
            return got

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                # NULL text reaches pandas as float NaN, which is truthy —
                # guard on type, not falsiness
                if not isinstance(text, str):
                    text = ""
                words = token_re.findall(text.lower())
                n_tok, sig = 0, 0
                for w in words:
                    k, h = enc(w)
                    n_tok += k
                    sig = (sig + h) % mod
                rows.append((int(doc_id), len(words), n_tok, sig))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_bpe_tokens", "bpe_sig"]
            )

    return docs.select("doc_id", text_col).mapInPandas(run, out_schema)


def bpe_pipeline(
    docs: DataFrame,
    n_merges: int = 64,
    max_vocab: int = DEFAULT_MAX_VOCAB,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Census -> train -> encode. Returns (merges, per-doc table)."""
    census = vocab_census(docs, text_col=text_col)
    merges = train_bpe_from_census(census, n_merges, max_vocab)
    return merges, bpe_encode_table(docs, merges, text_col)
