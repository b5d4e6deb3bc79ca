"""Driver-gate queries: ANN over the `embeddings` table."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .brute import topk_cosine
from .lsh import ann_topk_lsh, hyperplanes, sketch_table

ANN_QUERIES = {}
ANN_ORACLES = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        ANN_QUERIES[name] = fn
        if oracle is not None:
            ANN_ORACLES[name] = oracle
        return fn

    return deco


# The DuckDB oracle restates the exact left-fold double arithmetic of
# brute.cosine — verified bit-identical (native list_cosine_similarity is
# NOT: it accumulates in float).
_COS = (
    "list_sum(list_transform(list_zip(q.embedding, c.embedding),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


@_register(
    "ann_topk_brute",
    f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cos
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos
    FROM ranked WHERE rank <= 5
    """,
)
def ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the first 10 query vectors — broadcast
    queries x streamed corpus, JVM-side fold arithmetic, window top-k.
    Values AND ranks match DuckDB bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return topk_cosine(emb, queries, k=5)


@_register("ann_lsh_buckets", None)  # sketch buckets: not SQL-expressible
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-sketch bucket census per LSH table — the skew statistics the
    candidate join consumes (recall vs brute force gated in pytest)."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = hyperplanes(dim=64, bits=12, tables=4)
    sk = sketch_table(emb, planes)
    return (
        sk.groupBy("table_id", "sketch")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .groupBy("table_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("bucket_n").alias("max_bucket"),
            F.sum(F.when(F.col("bucket_n") > 1, 1).otherwise(0)).alias("n_multi"),
        )
    )


@_register("ann_topk_lsh", None)  # approximate -> rows-only; recall gated in pytest
def ann_topk_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 for the first 10 queries: bucket
    equi-join candidates + exact re-rank of candidates only."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    planes = hyperplanes(dim=64, bits=10, tables=8)
    return ann_topk_lsh(emb, queries, planes, k=5)


@_register("ann_topk_ivf", None)  # approximate -> recall gated in pytest
def ann_topk_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (k-means coarse quantizer + nprobe probing +
    exact re-rank) — the second ANN scale path; full registry + pytest
    surface (the driver's 50 slots carry the LSH variant)."""
    from .ivf import ann_topk_ivf, train_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cent = train_centroids(emb, k=16, iters=8, seed=42)
    return ann_topk_ivf(emb, queries, cent, k=5, nprobe=4)


@_register(
    "embedding_neardup_pairs",
    f"""
    SELECT q.vec_id AS id_a, c.vec_id AS id_b, {_COS} AS cos
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 400 AND c.vec_id < 400 AND q.vec_id < c.vec_id
      AND {_COS} >= 0.42
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with cosine >=
    threshold over a bounded id range — exact pair enumeration with a
    bit-exact DuckDB oracle (the same left-fold arithmetic as topk).
    The unbounded-scale path is lsh.lsh_candidates (sketch buckets ->
    candidates) followed by this exact cosine filter; its recall is gated
    in pytest. Threshold 0.42 is calibrated to the synthetic embeddings
    (near-uniform vectors: max pairwise cosine ~0.49)."""
    import pyspark.sql.functions as FF

    from .brute import cosine

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(FF.col("e_a"), FF.col("e_b")).alias("cos"))
        .filter(F.col("cos") >= 0.42)
    )
