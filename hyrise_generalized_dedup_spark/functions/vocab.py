"""Tokenizer-training pre-passes: corpus vocabulary census + BPE
first-merge pair statistics.

The two corpus-wide statistics a BPE/unigram tokenizer trainer needs
before its first merge: (1) the word-level vocabulary with document and
occurrence counts, (2) adjacent symbol-pair frequencies weighted by word
occurrences — exactly the argmax input of BPE merge iteration #1
(Sennrich et al., ACL 2016).

Scale shape: the token explode is map-side (content never shuffles);
the census is one partial-agg groupBy bounded by the corpus vocabulary;
pair statistics run over the *distinct-token* census (vocabulary-sized,
millions of rows at worst), not over the corpus — so the expensive part
is a single groupBy on the token key, same bound as any word-count.
All JVM Column expressions; no Python in the path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# word tokens: lowercased alnum/underscore runs — shared verbatim with the
# DuckDB oracles (Java ∩ RE2 regex subset)
TOKEN_RE = "[a-z0-9_]+"


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)
            )
        ).alias("token"),
    )


def vocab_census(
    docs: DataFrame,
    min_docs: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: one row per distinct token appearing in >=
    min_docs documents, with distinct-document and total occurrence
    counts. Output is vocabulary-bounded regardless of corpus size."""
    return (
        _tokens(docs, id_col, text_col)
        .groupBy("token")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def bpe_pair_stats(
    docs: DataFrame,
    min_docs: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adjacent character-pair frequencies weighted by word occurrences —
    the candidate table whose argmax is BPE's first merge. Computed over
    the vocabulary census (distinct tokens), so the pair explode touches
    vocabulary-sized data only; multi-char weighting multiplies by each
    token's corpus occurrence count."""
    vocab = vocab_census(docs, min_docs, id_col, text_col)
    # single-char tokens have no pairs; the filter also keeps Spark's
    # sequence(1, 0) descending-edge-case out of the transform entirely
    pairs = vocab.filter(F.length("token") >= 2).select(
        "n_occurrences",
        F.explode(
            F.expr(
                "transform(sequence(1, length(token) - 1),"
                " i -> substring(token, i, 2))"
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.sum("n_occurrences").alias("n_occurrences"),
        F.count("*").alias("n_token_forms"),
    )
