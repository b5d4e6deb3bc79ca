"""IVF (inverted-file) ANN: k-means coarse quantizer + probed-list search.

The second scale path for embedding similarity next to sign-sketch LSH
(ann/lsh.py). Shape at 10^12 rows:

1. TRAIN (driver, once): k-means over a bounded SAMPLE of the corpus —
   numpy Lloyd iterations with a kmeans++-style seeded init. Centroids
   are a (k x dim) float64 array, small enough to closure-broadcast.
2. ASSIGN (map-only): every corpus vector gets its nearest-centroid
   list_id via one numpy matmul per Arrow batch — no shuffle, the
   assignment table is written once and reused across queries.
3. PROBE: each query explodes to its nprobe nearest lists; candidates
   come from an equi-join on list_id. List sizes are censused and hot
   lists (a near-identical embedding family collapses into ONE list)
   are downsampled exactly like ann/lsh.py buckets — bounded join
   output, bucket-min kept, truncation visible via bucket_n.
4. RE-RANK: exact cosine over candidates only, window top-k.

Determinism: all randomness from the seed; sample taken by hash, not
Spark's RNG sampling."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .brute import cosine_vec


def train_centroids(
    corpus: DataFrame,
    k: int = 16,
    dim: int | None = None,
    sample_cap: int = 50_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n: int | None = None,
) -> np.ndarray:
    """k-means centroids from a deterministic hash-sample of the corpus.

    The sample (<= sample_cap rows) is the ONLY driver-side collect; at
    10^12 rows the sample fraction is estimated from a count the caller
    usually already has — pass it as `n` (parquet metadata makes it
    free) so training doesn't spend an extra count job per call."""
    if n is None:
        n = corpus.count()
    frac_denom = max(1, n // sample_cap)
    sample = (
        corpus.select(id_col, vec_col)
        .filter(F.pmod(F.xxhash64(id_col), F.lit(frac_denom)) == 0)
        .limit(sample_cap)
        .collect()
    )
    x = np.array([r[1] for r in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.Generator(np.random.PCG64(seed))

    # kmeans++-lite init: first centroid uniform, rest distance-weighted.
    # Degenerate corpora this module explicitly targets (every sampled
    # vector identical — a hot embedding family) make d2 all-zero; fall
    # back to uniform selection instead of rng.choice raising on a
    # zero-sum probability vector. Fewer samples than k: reuse rows
    # (duplicate centroids collapse in Lloyd; harmless).
    idx = [int(rng.integers(len(x)))]
    for _ in range(k - 1):
        d2 = np.min(
            [np.sum((x - x[i]) ** 2, axis=1) for i in idx], axis=0
        )
        total = d2.sum()
        if total <= 1e-24:
            idx.append(int(rng.integers(len(x))))
        else:
            idx.append(int(rng.choice(len(x), p=d2 / total)))
    cent = x[idx].copy()

    for _ in range(iters):
        sims = x @ cent.T  # cosine on normalized vectors
        assign = np.argmax(sims, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-12)
    return cent


def assign_lists(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "id",
) -> DataFrame:
    """-> (id, list_id) with each vector's nprobe nearest centroid lists
    (nprobe=1 for the corpus assignment, >1 for query probing). Map-only:
    one numpy matmul per Arrow batch, centroids closure-captured."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    cent = centroids.astype(np.float64)
    id_t = df.schema[id_col].dataType
    out_schema = StructType(
        [StructField(out_id, id_t, False), StructField("list_id", IntegerType(), False)]
    )

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = vecs @ cent.T  # (n, k)
            top = np.argsort(-sims, axis=1)[:, :nprobe]  # (n, nprobe)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    out_id: np.repeat(ids, nprobe),
                    "list_id": top.ravel().astype(np.int32),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(compute, out_schema)


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_list: int = 4096,
) -> DataFrame:
    """Approximate top-k: candidates from the query's nprobe nearest
    centroid lists, exact cosine re-rank of candidates only. Hot lists
    downsampled to ~max_list members (deterministic, min id kept) — the
    ann/lsh.py census pattern applied to IVF lists."""
    c_assign = assign_lists(corpus, centroids, 1, id_col, vec_col, "neighbor_id")
    q_probe = assign_lists(queries, centroids, nprobe, id_col, vec_col, "query_id")

    census = c_assign.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("bucket_n"),
        F.min("neighbor_id").alias("bucket_min"),
    )
    c_bounded = c_assign.join(census, "list_id").filter(
        (F.col("bucket_n") <= max_list)
        | (F.col("neighbor_id") == F.col("bucket_min"))
        | (
            F.pmod(
                F.xxhash64("neighbor_id", "list_id"),
                F.ceil(F.col("bucket_n") / F.lit(max_list)).cast("long"),
            )
            == 0
        )
    )
    cand = (
        q_probe.join(c_bounded, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q_vec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c_vec = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(F.broadcast(q_vec), "query_id")
        .join(c_vec, "neighbor_id")
        .select("query_id", "neighbor_id", cosine_vec(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
