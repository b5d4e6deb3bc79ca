"""Deterministic global corpus shuffle — training-order assignment.

The last step before serving a training corpus: a reproducible global
permutation (the terashuf job at cluster scale). Each document keys on
sha256(seed || doc_id); the first hex digit picks one of 16 coarse
buckets and a per-bucket row_number assigns the in-bucket rank, so the
total order (bucket, rank_in_bucket) is a seeded permutation that is
content-independent, partitioning-invariant, and identical across
engines and runs — rand()-based shuffling is none of those.

Scale shape: one hash-partitioned exchange on the bucket key + a
per-bucket sort (Spark's window sorts within partitions); no global
sort, no driver state. Bucket fan-out is the parallelism knob — at
10^12 docs raise n_buckets so per-bucket sorts fit an executor
(the two-hex-digit variant gives 256; the primitive is the same).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_HEX = "0123456789abcdef"


def shuffle_order(
    docs: DataFrame,
    seed: str = "shuf",
    n_buckets: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, rank_in_bucket) — iterate buckets in order, ranks
    within, for the seeded global permutation. n_buckets must divide 16
    or be 16 here (one hex digit); callers needing more fan-out take
    more digits."""
    if n_buckets < 1 or 16 % n_buckets:
        raise ValueError("n_buckets must divide 16 (one hex digit)")
    key = F.sha2(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")), 256
    )
    bucket = (F.instr(F.lit(_HEX), F.substring(key, 1, 1)) - 1) % n_buckets
    keyed = docs.select(
        F.col(id_col), key.alias("shuf_key"), bucket.cast("long").alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy("shuf_key", id_col)
    return keyed.select(
        id_col,
        "bucket",
        F.row_number().over(w).cast("long").alias("rank_in_bucket"),
    )
