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


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join: a join key whose partition dwarfs the median is split
    at runtime into multiple tasks (north-rule requirement: skew handled
    explicitly; this is the built-in backstop behind the pipeline's own
    hot-bucket star routing — dedup/lsh.py handles the quadratic-output
    case AQE cannot, AQE handles the oversized-partition case here)."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # key 0 holds ~95% of the fact rows with a fat payload; dim is even
        fact = (
            spark.range(20000)
            .withColumn("k", (F.col("id") % 100) * (F.col("id") % 20 == 0).cast("int"))
            .withColumn("payload", F.repeat(F.lit("x"), 200))
        )
        dim = spark.range(100).withColumnRenamed("id", "k").withColumn(
            "label", F.concat(F.lit("d"), F.col("k"))
        )
        j = fact.join(dim, "k")
        n = j.count()
        assert n == 20000
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
