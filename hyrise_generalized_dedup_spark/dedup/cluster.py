"""Connected components over candidate edges — pure DataFrame iteration.

Min-label propagation with per-iteration localCheckpoint (lineage cut —
without it the plan doubles every iteration and the driver OOMs compiling
it; this IS the "checkpointed" in checkpointed resumability for the
clustering stage). Deterministic: labels are keys, merged with min(), so
the cluster id is always the lexicographically smallest member key —
reproducible across runs/partitionings for the recall comparison.

Convergence: edges from LSH/SimHash form near-cliques and star
structures (hot buckets emit stars by construction, lsh.py), so the
label graph's effective diameter is small; iteration count is bounded
and logged, never silent (north-rule: no silent truncation).
"""

from __future__ import annotations

import logging

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .lsh import hard_unpersist

log = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    key_col: str = "doc_key",
    max_iter: int = 25,
    check_every: int = 3,
    broadcast_labels_max: int | None = None,
) -> DataFrame:
    """edges(key_a, key_b) [+ optional nodes(key_col)] -> (key_col, cluster_id).

    Every node gets a cluster id (singletons map to themselves when a
    `nodes` frame is supplied).

    The convergence check is an extra blocking job per iteration; since
    LSH/star edge graphs converge in a handful of rounds, checking every
    `check_every` iterations amortizes that fixed latency (at worst
    check_every-1 extra cheap propagation rounds after convergence —
    propagating an already-stable labelling is a no-op data-wise).

    broadcast_labels_max: when the caller KNOWS the node count is below
    this bound, the per-iteration labels⋈edges join broadcasts the label
    table instead of shuffling both sides — CC is latency-bound (a chain
    of small sequential jobs), and removing the exchange per iteration is
    the difference between scaling and anti-scaling at high core counts.
    At 10^12-node scale labels are not broadcastable and this stays None
    (shuffled join; AQE handles it)."""
    sym = (
        edges.select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))
        .union(edges.select(F.col("key_b").alias("src"), F.col("key_a").alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # localCheckpoint persists its data (that IS the truncated lineage),
    # so superseded checkpoints must be explicitly unpersisted or every
    # iteration's label table stays pinned in executor storage for the
    # session. prev_ckpt is released only AFTER the next checkpoint is
    # fully materialized (the full convergence count below guarantees
    # that) — unpersisting a truncated-lineage RDD before its successor
    # exists would lose data with no lineage to recompute from.
    prev_ckpt = labels

    maybe_b = F.broadcast if broadcast_labels_max else (lambda d: d)

    converged = False
    for it in range(max_iter):
        # each node adopts min(own label, neighbors' labels); carrying the
        # previous label through the aggregation lets one job both
        # materialize the checkpoint and answer the convergence check
        neighbor_labels = (
            sym.join(maybe_b(labels.withColumnRenamed("node", "dst_node")),
                     sym.dst == F.col("dst_node"))
            .select(F.col("src").alias("node"), F.col("label"), F.lit(None).cast(labels.schema["label"].dataType).alias("prev"))
        )
        new_labels = (
            labels.select("node", "label", F.col("label").alias("prev"))
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("prev").alias("prev"))
        )
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            new_labels = new_labels.localCheckpoint(eager=False)
            # full count (no limit-short-circuit): every partition of the
            # new checkpoint is materialized, making prev_ckpt releasable
            changed = new_labels.filter(F.col("label") != F.col("prev")).count()
            hard_unpersist(prev_ckpt)
            prev_ckpt = new_labels
            if changed == 0:
                labels = new_labels.select("node", "label")
                log.info("connected_components converged within %d iterations", it + 1)
                converged = True
                break
        labels = new_labels.select("node", "label")
    if not converged:
        log.warning("connected_components hit max_iter=%d without convergence", max_iter)
    # the edge table is not part of the result's lineage (labels derive
    # from the final checkpoint alone) — release it here
    hard_unpersist(sym)

    result = labels.select(F.col("node").alias(key_col), F.col("label").alias("cluster_id"))
    if nodes is not None:
        result = (
            nodes.select(key_col)
            .distinct()
            .join(result, key_col, "left")
            .withColumn("cluster_id", F.coalesce("cluster_id", F.col(key_col)))
        )
    # the final label checkpoint IS the result's lineage; callers that
    # materialize the result (checkpoint write / collect) release it via
    # lsh.release_candidates(result)
    result._gd_persisted = prev_ckpt
    return result
