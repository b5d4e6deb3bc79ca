#!/usr/bin/env python
"""Scaling probe for the Z-order layout write: identical jobs at two
core counts in separate JVMs over the SAME pre-materialized parquet
input (synthesis and a warm-up count excluded from the measured window —
the serving_scaling.py protocol). The measured job is the real
maintenance operation end to end: Morton key math (map-only column
arithmetic) + the range exchange + the sorted parquet write, with the
output partition count FIXED across levels so both levels do identical
work. The row-content fingerprint (exact integer sums) must be
bit-identical across levels.

Usage: python scripts/zorder_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
LEVELS = [2, 8]
BASE = "/tmp/zorder_scaling"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_rows, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# two decorrelated integer dims (multiplicative scramble mod primes) so
# the Morton range exchange sees a full 2-D spread, not a diagonal
(spark.range(n_rows).select(
    F.col("id").alias("doc_id"),
    F.pmod(F.col("id") * 2654435761, F.lit(1000003)).alias("x"),
    F.pmod(F.col("id") * 40503, F.lit(999983)).alias("y"))
 .repartition(48)
 .write.mode("overwrite").parquet(path))
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, path, outdir, out = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.functions.zorder import zorder_layout
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
base = spark.read.parquet(path)
base.count()  # warm the JVM + page cache so the window measures compute

t0 = time.time()
(zorder_layout(base, ["x", "y"], n_partitions=64)
 .write.mode("overwrite").parquet(outdir))
wall = time.time() - t0

back = spark.read.parquet(outdir)
fp = back.agg(
    F.count("*"), F.sum("doc_id"), F.sum("x"), F.sum("y"),
    # per-row product reduced mod a prime so the sum stays in int64
    F.sum(F.pmod(F.col("x") * F.col("y"), F.lit(1_000_000_007))),
).collect()[0]
json.dump({"cores": cores, "zorder_wall_s": round(wall, 2),
           "zorder_fp": [int(v) for v in fp]}, open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs(BASE, exist_ok=True)
    corpus = f"{BASE}/corpus"
    prep = f"{BASE}/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_ROWS), corpus], check=True)
    child = f"{BASE}/child.py"
    open(child, "w").write(_CHILD)
    results = {}
    for cores in sorted(LEVELS, reverse=True):
        out = f"{BASE}/out_{cores}.json"
        subprocess.run(
            [sys.executable, child, str(cores), corpus,
             f"{BASE}/laid_{cores}", out],
            check=True,
        )
        results[cores] = json.load(open(out))
        print(f"cores={cores} zorder={results[cores]['zorder_wall_s']}s")
    lo, hi = min(LEVELS), max(LEVELS)
    same = results[lo]["zorder_fp"] == results[hi]["zorder_fp"]
    ratio = hi / lo
    report = {
        "n_rows": N_ROWS,
        "levels": {
            str(c): {"zorder_wall_s": results[c]["zorder_wall_s"]}
            for c in LEVELS
        },
        "results_identical_across_levels": same,
        "zorder_scaling_efficiency": round(
            results[lo]["zorder_wall_s"]
            / (ratio * results[hi]["zorder_wall_s"]), 3
        ),
        "zorder_fp": results[hi]["zorder_fp"],
    }
    with open("/root/repo/BENCH/evals/zorder_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree(BASE, ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
