"""Per-stage, per-partition lineage metrics (north rule: checkpointed
lineage + metrics so any stage is resumable and auditable).

Each pipeline stage appends rows to a metrics table:
(stage, partition_id, rows, wall_ms, config_hash) — partition-granular so
skew is visible in the metrics themselves (a hot LSH band shows up as one
partition with 100x rows)."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def partition_histogram(df: DataFrame, stage: str, config_hash: str, wall_ms: int) -> DataFrame:
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("stage", F.lit(stage))
        .withColumn("wall_ms", F.lit(wall_ms))
        .withColumn("config_hash", F.lit(config_hash))
        .select("stage", "partition_id", "rows", "wall_ms", "config_hash")
    )


class MetricsCollector:
    def __init__(self, spark: SparkSession, out_dir: str, config_hash: str):
        self.spark = spark
        self.out_dir = out_dir
        self.config_hash = config_hash
        self._t0: dict[str, float] = {}
        self.summary: dict[str, object] = {"config_hash": config_hash}

    def start(self, stage: str) -> None:
        self._t0[stage] = time.time()

    def finish(self, stage: str, df: DataFrame) -> None:
        """Write the partition histogram for a completed (already
        materialized) stage."""
        wall_ms = int((time.time() - self._t0.get(stage, time.time())) * 1000)
        hist = partition_histogram(df, stage, self.config_hash, wall_ms)
        path = os.path.join(self.out_dir, "metrics", stage)
        hist.write.mode("overwrite").parquet(path)
        self.summary[f"{stage}_wall_ms"] = wall_ms

    def add(self, **kv: object) -> None:
        self.summary.update(kv)

    def write_summary(self) -> str:
        path = os.path.join(self.out_dir, "metrics", "summary.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(self.summary, fh, indent=2, sort_keys=True, default=str)
        return path
