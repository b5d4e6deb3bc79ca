"""Data-layout tests: partitioned writes + partition pruning — the Spark
analog of the reference's ChunkPruningRule (chunk_pruning_rule.hpp:14-18:
static per-chunk statistics prune chunks before the scan)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_partitioned_write_prunes_scan(spark, sf_tiny, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    # pruned read returns exactly the F partition
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert df.count() == expected


def test_bucketed_join_avoids_shuffle(spark, sf_tiny, tmp_path):
    """Bucketed tables co-locate equi-join keys: the join plan contains no
    Exchange on the bucketed key (reference analog: pre-partitioned radix
    join without re-partitioning)."""
    orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
    customer = spark.read.parquet(f"{sf_tiny}/customer.parquet")
    (orders.write.mode("overwrite").bucketBy(4, "o_custkey")
        .option("path", str(tmp_path / "orders_b")).saveAsTable("orders_b"))
    (customer.write.mode("overwrite").bucketBy(4, "c_custkey")
        .option("path", str(tmp_path / "customer_b")).saveAsTable("customer_b"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_dynamic_partition_pruning(spark, sf_tiny, tmp_path):
    """DPP: a fact table partitioned on the join key is pruned at RUNTIME
    by the dim side's filter (reference analog: ChunkPruningRule +
    SemiJoinReductionRule combined — the pruning predicate is only known
    after the dim filter runs)."""
    out = str(tmp_path / "orders_by_status_dpp")
    orders = spark.read.parquet(f"{sf_tiny}/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    fact = spark.read.parquet(out)
    dim_path = str(tmp_path / "status_dim")
    spark.createDataFrame(
        [("F", "closed"), ("O", "open"), ("P", "pending")],
        "o_orderstatus string, label string",
    ).write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("label") == "closed")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    j = fact.join(dim, "o_orderstatus")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert j.count() == expected
