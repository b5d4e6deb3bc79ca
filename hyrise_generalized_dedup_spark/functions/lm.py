"""CCNet-style n-gram language-model perplexity filtering.

The reference repo has no model-based quality filter; this is one of the
large-scale training-data-pipeline operators the build adds as first-class
(CCNet, Wenzek et al. 2020: score each document by the cross-entropy of a
small LM trained on a trusted reference slice, keep the low-perplexity
head). Re-expressed Spark-first:

- the model is a word-bigram table with add-alpha smoothing, built by two
  plain ``groupBy`` aggregations over the reference slice (bigram counts,
  then context counts folded from them — no second scan of the corpus);
- scoring is two equi-joins of the exploded document bigrams against the
  model (broadcast when the model is small, shuffle hash join past the
  threshold) plus one per-doc aggregate — zero Python anywhere.

Scale story: the corpus is scanned once for training bigrams and once for
scoring (the score scan covers all docs, so the train scan could be fused
into it with a filtered aggregate; kept separate for checkpointability).
The model size is vocabulary-bounded, independent of corpus row count, so
at 100 TB the joins stay broadcast for any natural-language vocabulary and
degrade to an AQE-planned shuffle join (keyed on w1 / the pair) only for
adversarial vocabularies. All driver-gate columns are exact integers or
integer-derived booleans — sums of BIGINT counts are order-independent, so
the gate is bit-stable across partitionings; the float cross-entropy /
perplexity columns are pytest-oracled against numpy instead (summation
order of ``ln`` terms is not bit-portable across engines).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Model tables smaller than this many rows are broadcast to the score join;
# larger models fall back to a shuffle hash join (AQE handles skew). 2M rows
# of (w1, w2, c2) is ~tens of MB — comfortably under Spark's 8 GB broadcast
# cap with headroom for executor heap pressure.
BROADCAST_MAX_MODEL_ROWS = 2_000_000

# Keep rule on the exact-integer surface: a document passes when its
# out-of-vocabulary bigram fraction is <= OOV_KEEP_NUM / OOV_KEEP_DEN.
# (The float perplexity threshold is a tuning knob downstream; the integer
# rule is the bit-stable gate surface.)
OOV_KEEP_NUM = 1
OOV_KEEP_DEN = 5


def _tokens(col: Column) -> Column:
    """Lowercased whitespace tokens of the trimmed document (empty array
    for blank docs) — the same token definition as the decontamination
    grams (text.word_ngrams), so LM vocabulary and decontamination share
    a unit."""
    trimmed = F.trim(F.lower(col))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode each document into its adjacent word bigrams:
    ``(doc_id, w1, w2)``, one row per bigram occurrence (duplicates kept —
    the LM needs multiplicities). Docs with < 2 tokens produce no rows.
    Pure array HOFs inside the scan stage; the explode is map-side."""
    # Project the token split as its own column so the transform lambda's
    # element_at reads a materialized array instead of re-splitting the
    # document per element (text.tokens_lower rationale).
    w = F.col("__toks")
    pairs = F.when(
        F.size(w) < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.transform(
            F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda t, i: F.struct(t.alias("w1"), F.element_at(w, i + 2).alias("w2")),
        )
    )
    return (
        docs.select("doc_id", _tokens(F.col(text_col)).alias("__toks"))
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_model(
    bigrams: DataFrame, ref_filter: Column
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Aggregate the reference slice into the model tables.

    Returns ``(pair_counts, ctx_counts, vocab)``:

    - ``pair_counts``: (w1, w2, c2) — bigram occurrence counts;
    - ``ctx_counts``: (w1, c1) — context counts, folded from pair_counts
      (c1 = sum of c2 over w2), so conditional probabilities normalize to
      1 per context by construction;
    - ``vocab``: 1-row (v) — distinct successor-word count, the smoothing
      denominator term (unseen events get the +1 slot).

    Two shuffles total (pair groupBy, then the tiny ctx fold); map-side
    partial aggregation does the heavy lifting on the first."""
    ref = bigrams.where(ref_filter)
    pair_counts = ref.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    ctx_counts = pair_counts.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    vocab = pair_counts.agg(
        (F.countDistinct("w2") + F.lit(1)).cast("long").alias("v")
    )
    return pair_counts, ctx_counts, vocab


def lm_score_table(
    docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    ref_mod: int = 2,
) -> DataFrame:
    """Per-document bigram-LM score table.

    The reference slice is ``doc_id % ref_mod == 0`` (deterministic, no
    sampling RNG); every document — reference or not — is scored against
    the model trained on that slice. Output, one row per input document:

    - ``n_bigrams``      BIGINT  bigram occurrences in the doc (0 if < 2 tokens)
    - ``n_oov_bigrams``  BIGINT  bigrams unseen in the reference model
    - ``sum_pair_c``     BIGINT  sum of model bigram counts over doc bigrams
    - ``sum_ctx_c``      BIGINT  sum of model context counts over doc bigrams
    - ``lm_keep``        BOOLEAN n_oov_bigrams * OOV_KEEP_DEN <= n_bigrams * OOV_KEEP_NUM
                                 (vacuously true for 0-bigram docs)
    - ``cross_entropy``  DOUBLE  -mean ln P(w2|w1), add-alpha smoothed
                                 (NULL for 0-bigram docs)
    - ``perplexity``     DOUBLE  exp(cross_entropy)

    The first five columns are exact integers/booleans (bit-stable under
    any partitioning — they are the driver-gate surface); the two float
    columns are pytest-oracled."""
    bg = doc_bigrams(docs, text_col)
    pair_counts, ctx_counts, vocab = train_bigram_model(
        bg, (F.col("doc_id") % ref_mod) == 0
    )

    # The model is vocabulary-bounded (corpus-size-independent), and three
    # consumers hang off it (ctx fold, vocab count, score join). Persist it
    # so training reads the corpus exactly ONCE — without this, Spark
    # recomputes the pair-count lineage per consumer and the reference
    # slice is scanned three times (visible in .explain as three parquet
    # scans). The count() below doubles as the materializing action.
    pair_counts = pair_counts.persist()
    n_model_rows = pair_counts.count()
    if n_model_rows <= BROADCAST_MAX_MODEL_ROWS:
        pair_counts = F.broadcast(pair_counts)
        ctx_counts = F.broadcast(ctx_counts)
    # vocab is always a single row
    v = F.broadcast(vocab)

    scored = (
        bg.join(pair_counts, ["w1", "w2"], "left")
        .join(ctx_counts, ["w1"], "left")
        .crossJoin(v)
        .select(
            "doc_id",
            F.coalesce(F.col("c2"), F.lit(0)).alias("c2"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
            "v",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("c2") == 0, 1).otherwise(0)).cast("long").alias(
                "n_oov_bigrams"
            ),
            F.sum("c2").cast("long").alias("sum_pair_c"),
            F.sum("c1").cast("long").alias("sum_ctx_c"),
            (-F.avg(
                F.log((F.col("c2") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v")))
            )).alias("cross_entropy"),
        )
    )

    out = (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_oov_bigrams", F.lit(0)).cast("long").alias("n_oov_bigrams"),
            F.coalesce("sum_pair_c", F.lit(0)).cast("long").alias("sum_pair_c"),
            F.coalesce("sum_ctx_c", F.lit(0)).cast("long").alias("sum_ctx_c"),
            "cross_entropy",
        )
        .withColumn(
            "lm_keep",
            (F.col("n_oov_bigrams") * OOV_KEEP_DEN)
            <= (F.col("n_bigrams") * OOV_KEEP_NUM),
        )
        .withColumn("perplexity", F.exp("cross_entropy"))
    )
    return out
