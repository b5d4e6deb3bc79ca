"""DSIR-style importance-resampling weights over hashed n-gram features.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
scores each raw document by the log-likelihood ratio of two bag-of-
hashed-n-grams models — one fit on a small TARGET distribution (the data
you want more of), one on the RAW pool — and resamples the pool in
proportion to the weight. The reference repo has no model-based selection
operator; this is one of the training-data-pipeline additions the build
carries as first-class, re-expressed Spark-first:

- features are hashed unigram + bigram OCCURRENCES bucketed into a fixed
  modulus ``buckets`` (DSIR §3.2 uses hashed n-grams for exactly this
  reason: the model is O(buckets), independent of vocabulary and corpus
  size);
- both models come from ONE ``groupBy(bucket)`` over the exploded grams
  with a conditional sum for the target slice — a single corpus scan and
  a single bucket-keyed shuffle trains both distributions;
- scoring joins each document's grams against the (always tiny,
  ``buckets``-bounded) count table via an unconditional broadcast, then
  one per-doc aggregate. Zero Python anywhere.

Cross-engine determinism: the gate surface is exact integers (counts and
count sums) plus a lean-vote keep rule evaluated with single-rounded
IEEE-754 double products — ``(ct+1)·(Nr+B) > (cr+1)·(Nt+B)`` — which
both Spark and DuckDB compute bit-identically (one multiply each side,
exactly-rounded by the standard). The float ``log_weight`` column (the
actual DSIR statistic, add-alpha smoothed) is pytest-oracled against
numpy instead: a sum of ``ln`` terms is not order-portable across
engines. The gram hash is the repo's shared md5 trick — Spark
``conv(substr(md5(g),1,12),16,10)`` == DuckDB
``('0x'||substr(md5(g),1,12))::BIGINT`` — so bucket ids are bit-equal
across engines by construction.

Scale shape at 10^12 docs: the gram explode is map-side work in the scan
stage; the only corpus-sized shuffle keys on ``bucket`` (uniform by
construction — md5 output, no skew) with map-side partial aggregation;
the model broadcast is ``buckets`` rows regardless of corpus size; the
per-doc score aggregate shuffles on doc_id once. Selection on the
weights composes with ``mixture.quality_prune`` (census-threshold
top-fraction keep, no global sort) — the two stages together are the
DSIR "estimate importance weights, then resample" recipe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .lm import _tokens

# Default hashed-feature modulus. DSIR's reference implementation uses 10k
# buckets; 4096 keeps the planted-collision tests meaningful at pytest
# scale while staying the same order of magnitude. The model table is
# <= buckets rows — broadcast unconditionally.
DEFAULT_BUCKETS = 4096

# Add-alpha smoothing for the float log-weight (matches lm.py's default).
DEFAULT_ALPHA = 0.5


def _gram_strings(col: Column) -> Column:
    """Array of unigram + bigram feature strings for one document.

    Unigrams are the whitespace tokens themselves; bigrams are
    ``w1 || ' ' || w2``. Tokens cannot contain spaces (they are
    whitespace-split), so the two feature kinds cannot collide before
    hashing. Empty docs yield an empty array."""
    w = _tokens(col)
    bigrams = F.when(
        F.size(w) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda t, i: F.concat(t, F.lit(" "), F.element_at(w, i + 2)),
        )
    )
    return F.concat(w, bigrams)


def hashed_grams(
    docs: DataFrame, text_col: str = "text", buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Explode each document into hashed n-gram feature occurrences:
    ``(doc_id, bucket)``, one row per unigram/bigram occurrence
    (multiplicities kept — the models need them). The hash is the
    cross-engine md5-prefix trick, so a DuckDB oracle reproduces every
    bucket id bit-for-bit."""
    # Token split projected first so the bigram lambda's element_at reads a
    # materialized array (text.tokens_lower rationale); _gram_strings over
    # the column then costs one split per doc instead of one per bigram.
    w = F.col("__toks")
    bigrams = F.when(
        F.size(w) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda t, i: F.concat(t, F.lit(" "), F.element_at(w, i + 2)),
        )
    )
    g = F.explode(F.concat(w, bigrams)).alias("g")
    h = F.conv(F.substring(F.md5(F.col("g")), 1, 12), 16, 10).cast("long")
    return (
        docs.select("doc_id", _tokens(F.col(text_col)).alias("__toks"))
        .select("doc_id", g)
        .select("doc_id", (h % F.lit(buckets)).alias("bucket"))
    )


def dsir_table(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    target_mod: int = 2,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Per-document DSIR importance table.

    The TARGET slice is ``doc_id % target_mod == 0`` (deterministic — at
    production scale this filter is replaced by "rows from the trusted
    source"); the RAW distribution is the whole input. Output, one row
    per input document:

    - ``dsir_n_grams``   BIGINT  hashed-gram occurrences in the doc
    - ``dsir_sum_tc``    BIGINT  sum of target-model bucket counts over them
    - ``dsir_sum_rc``    BIGINT  sum of raw-model bucket counts over them
    - ``dsir_n_lean``    BIGINT  grams whose bucket leans target:
                                 (ct+1)·(Nr+B) > (cr+1)·(Nt+B) as doubles
    - ``dsir_keep``      BOOLEAN majority lean: 2·n_lean >= n_grams
                                 (vacuously true for empty docs)
    - ``log_weight``     DOUBLE  Σ ln((ct+α)/(Nt+αB)) − ln((cr+α)/(Nr+αB))
                                 (NULL for empty docs; pytest-oracled)

    The integer/boolean columns are the driver-gate surface — bit-stable
    under any partitioning because they are sums of BIGINTs and
    single-rounded double comparisons."""
    grams = hashed_grams(docs, text_col, buckets)

    # One scan, one bucket-keyed shuffle trains BOTH models: the raw count
    # is the plain count, the target count a conditional sum over the
    # deterministic slice.
    model = grams.groupBy("bucket").agg(
        F.count("*").cast("long").alias("cr"),
        F.sum(
            F.when((F.col("doc_id") % target_mod) == 0, 1).otherwise(0)
        ).cast("long").alias("ct"),
    )
    # <= buckets rows by construction — persist so the totals aggregate and
    # the score join share one training pass, and broadcast unconditionally.
    model = model.persist()
    totals = F.broadcast(
        model.agg(
            F.sum("cr").cast("long").alias("nr"),
            F.sum("ct").cast("long").alias("nt"),
        )
    )
    model = F.broadcast(model)

    b = float(buckets)
    lean = (
        (F.col("ct") + F.lit(1)).cast("double") * (F.col("nr") + F.lit(b))
        > (F.col("cr") + F.lit(1)).cast("double") * (F.col("nt") + F.lit(b))
    )
    log_term = F.log(
        (F.col("ct") + F.lit(alpha)) / (F.col("nt") + F.lit(alpha * b))
    ) - F.log((F.col("cr") + F.lit(alpha)) / (F.col("nr") + F.lit(alpha * b)))

    scored = (
        grams.join(model, "bucket")  # raw model covers every gram: inner is lossless
        .crossJoin(totals)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("dsir_n_grams"),
            F.sum("ct").cast("long").alias("dsir_sum_tc"),
            F.sum("cr").cast("long").alias("dsir_sum_rc"),
            F.sum(F.when(lean, 1).otherwise(0)).cast("long").alias("dsir_n_lean"),
            F.sum(log_term).alias("log_weight"),
        )
    )

    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dsir_n_grams", F.lit(0)).cast("long").alias("dsir_n_grams"),
            F.coalesce("dsir_sum_tc", F.lit(0)).cast("long").alias("dsir_sum_tc"),
            F.coalesce("dsir_sum_rc", F.lit(0)).cast("long").alias("dsir_sum_rc"),
            F.coalesce("dsir_n_lean", F.lit(0)).cast("long").alias("dsir_n_lean"),
            (
                F.coalesce("dsir_n_lean", F.lit(0)) * 2
                >= F.coalesce("dsir_n_grams", F.lit(0))
            ).alias("dsir_keep"),
            "log_weight",
        )
    )
