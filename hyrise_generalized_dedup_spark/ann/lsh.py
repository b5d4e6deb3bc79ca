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

from .brute import cosine


def hyperplanes(dim: int, bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((tables, bits, dim))


def _sketch(vec: Column, planes: np.ndarray) -> Column:
    """Sign sketch of one table: int64 with bit j = sign(vec . plane_j)."""
    bits_, _dim = planes.shape
    acc = F.lit(0).cast("long")
    for j in range(bits_):
        plane = F.array(*[F.lit(float(v)) for v in planes[j]])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        acc = acc + F.when(d >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def sketch_table(
    df: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, table_id, sketch) — one row per vector per LSH table."""
    tables = planes.shape[0]
    sketches = F.array(
        *[
            F.struct(F.lit(t).alias("table_id"), _sketch(F.col(vec_col), planes[t]).alias("sketch"))
            for t in range(tables)
        ]
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sketches).alias("s"))
        .select("id", F.col("s.table_id").alias("table_id"), F.col("s.sketch").alias("sketch"))
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates from bucket agreement in ANY table,
    exact cosine re-rank of the candidate set only."""
    c_sk = sketch_table(corpus, planes, id_col, vec_col).withColumnRenamed("id", "neighbor_id")
    q_sk = sketch_table(queries, planes, id_col, vec_col).withColumnRenamed("id", "query_id")
    cand = (
        q_sk.join(c_sk, ["table_id", "sketch"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q_vec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c_vec = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(F.broadcast(q_vec), "query_id")
        .join(c_vec, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
