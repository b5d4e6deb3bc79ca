#!/usr/bin/env python
"""Scaling probe for the DSIR importance-resampling operator: identical
jobs at two core counts in separate JVMs over the SAME pre-materialized
parquet corpus (synthesis and a warm-up count excluded from the measured
window — the serving_scaling.py protocol). The gate surface is exact
integers, so an order-independent numeric fingerprint of the result must
be bit-identical across levels; any divergence is a bug, not noise.

Usage: python scripts/dsir_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
LEVELS = [2, 8]
CORPUS = "/tmp/dsir_scaling/corpus"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_rows, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# deterministic variable-length docs over a 1000-word vocabulary:
# 1-50 tokens each, token stream varies per doc so bigram buckets spread
(spark.range(n_rows).select(
    F.col("id").alias("doc_id"),
    F.array_join(
        F.transform(
            F.sequence(F.lit(1), (F.col("id") % 50 + 1).cast("int")),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.col("id") * 31 + i * 7, F.lit(1000))
            ),
        ),
        " ",
    ).alias("text"))
 .repartition(48)
 .write.mode("overwrite").parquet(path))
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, path, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.functions.dsir import dsir_table
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
base = spark.read.parquet(path)
base.count()  # warm the JVM + page cache so the window measures compute

t0 = time.time()
fp = dsir_table(base).agg(
    F.count("*"), F.sum("dsir_n_grams"), F.sum("dsir_sum_tc"),
    F.sum("dsir_sum_rc"), F.sum("dsir_n_lean"),
    F.sum(F.col("dsir_keep").cast("long")),
).collect()[0]
wall = time.time() - t0

json.dump({"cores": cores, "dsir_wall_s": round(wall, 2),
           "dsir_fp": [int(x) for x in fp]}, open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/dsir_scaling", exist_ok=True)
    prep = "/tmp/dsir_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_ROWS), CORPUS], check=True)
    child = "/tmp/dsir_scaling/child.py"
    open(child, "w").write(_CHILD)
    results = {}
    for cores in sorted(LEVELS, reverse=True):
        out = f"/tmp/dsir_scaling/out_{cores}.json"
        subprocess.run(
            [sys.executable, child, str(cores), CORPUS, out], check=True
        )
        results[cores] = json.load(open(out))
        print(f"cores={cores} dsir={results[cores]['dsir_wall_s']}s")
    lo, hi = min(LEVELS), max(LEVELS)
    same = results[lo]["dsir_fp"] == results[hi]["dsir_fp"]
    ratio = hi / lo
    report = {
        "n_rows": N_ROWS,
        "levels": {
            str(c): {"dsir_wall_s": results[c]["dsir_wall_s"]} for c in LEVELS
        },
        "results_identical_across_levels": same,
        "dsir_scaling_efficiency": round(
            results[lo]["dsir_wall_s"] / (ratio * results[hi]["dsir_wall_s"]), 3
        ),
        "dsir_fp": results[hi]["dsir_fp"],
    }
    with open("/root/repo/BENCH/evals/dsir_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/dsir_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
