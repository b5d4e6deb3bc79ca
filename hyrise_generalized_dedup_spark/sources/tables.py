"""Table sources.

Spark-side analog of the reference's ``GetTable`` / ``Import`` operators
(reference: src/lib/operators/get_table.hpp:13-29,
src/lib/operators/import.cpp) — but here "pruned chunk ids / pruned
column ids" are Catalyst's partition pruning + column pruning, which we
get for free by reading parquet lazily and selecting declaratively.

An Iceberg catalog is the production source (north_star); this sandbox
image has no Iceberg jars, so ``load_table`` falls back to plain parquet
with the same schema contract (gated behind an import/config try, not a
code fork).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one named table: Iceberg if the catalog is configured, else parquet."""
    catalog = spark.conf.get("spark.sql.catalog.gd", None)
    if catalog:
        try:
            return spark.read.table(f"gd.{os.path.basename(sf_dir)}.{name}")
        except Exception:
            pass  # catalog configured but table absent -> parquet fallback
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views so ``spark.sql`` plans against them
    (the analog of the reference's StorageManager named-table catalog,
    src/lib/storage/storage_manager.hpp)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
