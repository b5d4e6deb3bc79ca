"""SparkSession factory.

One place that encodes the cluster-scale defaults: AQE on (runtime
re-plan + skew-join splitting), Arrow on (every UDF in this engine is
pandas/Arrow-vectorized), UTC session timezone (duckdb-oracle parity),
shuffle partitions sized to the parallelism level instead of the
200-partition default.

At 100 TB on a real cluster the same builder is used from
``spark-submit --py-files``; only ``master`` / ``shuffle_partitions``
change (see BENCH/BASELINE.md scaling protocol).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def shuffle_partitions(spark: SparkSession) -> int:
    """Numeric shuffle-partition count, tolerant of platforms that set
    ``spark.sql.shuffle.partitions`` to the non-numeric ``"auto"``
    (AQE-managed); falls back to the cluster's default parallelism."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        return spark.sparkContext.defaultParallelism


def get_spark(
    app_name: str = "hyrise-generalized-dedup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        sp_env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if sp_env:
            # explicit override for CLI-launched jobs (bench_scaling sets
            # 3x cores: at a fixed heap, partitions == cores gives each
            # hash-aggregate task heap/cores of map space, so the HIGH
            # parallelism level spills/GC-thrashes on pair-scale stages
            # while the low level coasts — an anti-scaling artifact of
            # task sizing, not of the plan; 2-3x cores is also the
            # documented real-cluster sizing)
            shuffle_partitions = int(sp_env)
        else:
            # local[N] -> N; a real cluster would use ~2-3x total executor cores.
            n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
            shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # edge verification collects the signature matrix driver-side while
        # it fits the broadcast budget (heap/16, see dedup/lsh.py); the
        # default 1g maxResultSize would cut that path off well below the
        # budget it was sized to
        .config("spark.driver.maxResultSize", "6g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    # On a real cluster each node has local SSD scratch that scales with
    # the node count; on this single-VM sandbox all shuffle/spill streams
    # share one ext4 disk, which serializes at high core counts. Allow
    # redirecting scratch to tmpfs via env (bench_scaling sets it).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
