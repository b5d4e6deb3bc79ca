"""Random-hyperplane LSH for cosine ANN — the 10^12-row scale path.

L independent sign-sketch tables of b bits each: vectors agreeing on a
whole sketch land in the same bucket; candidate neighbors come from a
bucket equi-join (same shuffle/skew shape as the text LSH — hot buckets
exist when many near-identical embeddings share a sketch, and the same
star-edge/caveat logic would apply; here buckets are censused and the
candidate join is bounded by per-bucket size).

Hyperplanes are seeded numpy normals, materialized once on the driver
and baked into the Catalyst plan as literal arrays — deterministic on
every executor; the sketch itself is computed JVM-side (aggregate over
zip_with), no Python in the 10^12-row map.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .brute import cosine_vec


def hyperplanes(dim: int, bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((tables, bits, dim))


def sketch_table(
    df: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, table_id, sketch) — one row per vector per LSH table.

    One numpy matmul per Arrow batch: (batch x dim) @ (dim x tables*bits)
    -> sign bits -> int64 sketches. (A Catalyst-literal fold per
    hyperplane compiled tables x bits fold expressions — plan compile
    time alone dominated at 8x10; the matmul is also ~100x less work per
    row.) Plane matrix is closure-captured once per executor."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    tables, bits, dim = planes.shape
    flat = planes.reshape(tables * bits, dim).T.astype(np.float64)  # (dim, t*b)
    weights = (1 << np.arange(bits, dtype=np.uint64))

    id_t = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id", id_t, False),
            StructField("table_id", IntegerType(), False),
            StructField("sketch", LongType(), False),
        ]
    )

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)  # (n, dim)
            signs = (vecs @ flat) >= 0                                     # (n, t*b)
            signs = signs.reshape(len(pdf), tables, bits).astype(np.uint64)
            sk = (signs * weights).sum(axis=2).astype(np.int64)            # (n, t)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, tables),
                    "table_id": np.tile(np.arange(tables, dtype=np.int32), len(pdf)),
                    "sketch": sk.ravel(),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(compute, out_schema)


def lsh_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1024,
) -> DataFrame:
    """-> distinct (query_id, neighbor_id) candidate pairs, skew-bounded.

    Corpus buckets are censused (groupBy, map-side combine) and hot
    buckets downsampled to ~max_bucket members via a deterministic hash
    filter, always keeping the bucket minimum id — so one family of
    near-identical embeddings costs O(max_bucket) candidates per query,
    not O(family). The per-(table, sketch) join output is bounded by
    |queries-in-bucket| x max_bucket."""
    c_sk = sketch_table(corpus, planes, id_col, vec_col).withColumnRenamed("id", "neighbor_id")
    q_sk = sketch_table(queries, planes, id_col, vec_col).withColumnRenamed("id", "query_id")
    census = c_sk.groupBy("table_id", "sketch").agg(
        F.count(F.lit(1)).alias("bucket_n"),
        F.min("neighbor_id").alias("bucket_min"),
    )
    c_bounded = c_sk.join(census, ["table_id", "sketch"]).filter(
        (F.col("bucket_n") <= max_bucket)
        | (F.col("neighbor_id") == F.col("bucket_min"))
        | (
            F.pmod(
                F.xxhash64("neighbor_id", "table_id", "sketch"),
                F.ceil(F.col("bucket_n") / F.lit(max_bucket)).cast("long"),
            )
            == 0
        )
    )
    return (
        q_sk.join(c_bounded, ["table_id", "sketch"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1024,
) -> DataFrame:
    """Approximate top-k: candidates from bucket agreement in ANY table,
    exact cosine re-rank of the candidate set only.

    Skew handling (explicit, same census pattern as dedup/lsh.py): a
    corpus of near-identical embeddings (common AFTER exact dedup of
    scraped data) puts millions of rows in one (table_id, sketch) bucket,
    making the naive equi-join quadratic on that key. The corpus sketch
    table is censused (groupBy — map-side combine, no window straggler)
    and hot buckets are DOWNSAMPLED to ~max_bucket members per bucket via
    a deterministic hash filter, always keeping the bucket's minimum id
    (so tie-broken-by-id exact re-ranking stays stable). The candidate
    join output is then bounded by |queries-in-bucket| x max_bucket. The
    truncation is not silent: every kept candidate row of a hot bucket
    carries bucket_n > max_bucket, and the `ann_lsh_buckets` gate query
    publishes the census (max bucket size per table) as the audit
    surface. Recall vs brute force is gated in pytest incl. a planted
    hot-bucket corpus."""
    cand = lsh_candidates(corpus, queries, planes, id_col, vec_col, max_bucket)
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
