"""Corpus mixture planning and rank-based quality pruning.

Two steps between curation and serving in an LLM data pipeline:

- **Mixture planning** (``mixture_plan``): given target sampling weights
  per source and a global token budget, compute each source's repeat
  factor and epoch count (the Pile/LLaMA-style static mixture table).
  Pure per-source aggregate arithmetic — one partial-agg groupBy over
  the corpus plus a broadcast join against the (tiny) weight table.

- **Quality pruning** (``quality_prune``): keep the top ``keep_frac``
  of each source by a DISCRETE quality score (FineWeb-Edu keeps docs
  by an integer 0-5 classifier score). Deliberately NOT a per-source
  row_number window: an exact within-source rank puts an entire source
  into one task — the skew killer at 10^12 docs. Instead the exact
  same keep set falls out of a score CENSUS: count docs per (source,
  score), take the per-source running total down the score axis, pick
  the threshold score where the running total first covers
  ``ceil(keep_frac * n)``, and broadcast the per-source thresholds
  back. The census is source x score-levels rows (thousands, not
  trillions); content never shuffles; ties at the threshold score are
  all kept — the deterministic, engine-reproducible statement of
  "top x%" for discrete scores.

Reference scope note: the reference engine (C++ Hyrise fork) has no
corpus-mixture stage; this module is part of the training-data-pipeline
surface (SURVEY.md LLM-ops section) alongside functions/split.py and
functions/pack.py.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def mixture_plan(
    docs: DataFrame,
    weights: Mapping[str, float],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source mixture table for a token budget.

    Output, one row per source present in ``weights`` (sources in the
    corpus but not in the map are dropped — an explicit mixture is a
    whitelist):

    - ``n_docs`` / ``n_tokens``: corpus-side size of the source
    - ``weight``: the requested sampling weight (must sum to 1)
    - ``target_tokens``: ``floor(weight * budget_tokens)``
    - ``repeat_factor``: target_tokens / n_tokens (double; >1 means the
      source is repeated across epochs, LLaMA-style)
    - ``epochs``: ``ceil(repeat_factor)`` — passes over the source
    - ``oversampled``: repeat_factor > 1
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")

    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        sorted(weights.items()), "source string, weight double"
    )
    stats = (
        docs.select(
            F.col(source_col).alias("source"),
            F.coalesce(token_count(F.col(text_col)), F.lit(0))
            .cast("long")
            .alias("_t"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_t").cast("long").alias("n_tokens"),
        )
    )
    target = F.floor(F.col("weight") * F.lit(float(budget_tokens))).cast("long")
    repeat = F.col("target_tokens") / F.col("n_tokens")
    return (
        stats.join(F.broadcast(wdf), "source")
        .withColumn("target_tokens", target)
        .withColumn("repeat_factor", repeat)
        .withColumn("epochs", F.ceil(F.col("repeat_factor")).cast("long"))
        .withColumn("oversampled", F.col("repeat_factor") > 1.0)
    )


def quality_prune(
    docs: DataFrame,
    score: Column,
    keep_frac: float,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_frac`` of each source by a discrete score.

    ``score`` must be an integral Column (bucket continuous scores
    first). Output, one row per input document: ``(doc_id, source,
    q_score, src_n, q_threshold, quality_keep)`` where ``q_threshold``
    is the source's cut score and ``quality_keep = q_score >=
    q_threshold``. All docs tied at the threshold are kept, so the kept
    count is the smallest count >= ``ceil(keep_frac * src_n)``
    achievable without splitting a tie — deterministic and independent
    of partitioning (no row_number over arbitrary orders).

    Plan shape: one content-free census groupBy (source x score
    levels), a window over the census only, and a broadcast join of the
    per-source thresholds back onto the scored scan.
    """
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        score.cast("long").alias("q_score"),
    )
    census = scored.groupBy("source", "q_score").agg(
        F.count("*").cast("long").alias("n")
    )
    w_desc = (
        Window.partitionBy("source")
        .orderBy(F.col("q_score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ranked = census.select(
        "source",
        "q_score",
        F.sum("n").over(w_desc).alias("cum_n"),
        F.sum("n").over(w_all).alias("src_n"),
    )
    target = F.ceil(F.lit(keep_frac) * F.col("src_n")).cast("long")
    thresholds = (
        ranked.where(F.col("cum_n") >= target)
        .groupBy("source")
        .agg(
            F.max("q_score").alias("q_threshold"),
            F.max("src_n").alias("src_n"),
        )
    )
    return (
        scored.join(F.broadcast(thresholds), "source")
        .select(
            "doc_id",
            "source",
            "q_score",
            "src_n",
            "q_threshold",
            (F.col("q_score") >= F.col("q_threshold")).alias("quality_keep"),
        )
    )
