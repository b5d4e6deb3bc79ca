#!/usr/bin/env python
"""Scaling probe for the two-pass heavy-hitters operator: identical job
at two core counts in separate JVMs over the SAME pre-materialized
parquet corpus (synthesis is excluded from the measured window — the
probe measures the operator: sketch scan + merge + exact verify).
Reports wall per level, result equality across levels (certification
makes the top-k exact and partitioning-independent, so any mismatch is
a bug), and the raw N->4N efficiency.

Usage: python scripts/heavy_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
LEVELS = [2, 8]
CORPUS = "/tmp/heavy_scaling/corpus"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_rows, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# deterministic skewed corpus: 40% of rows land on 50 hot keys, the rest
# are near-unique tail — the regime the sketch exists for
(spark.range(n_rows).select(
    F.when(F.col("id") % 5 < 2, F.concat(F.lit("hot-"), (F.col("id") % 50)))
    .otherwise(F.concat(F.lit("cold-"), F.col("id")))
    .alias("v"))
 .repartition(48)
 .write.mode("overwrite").parquet(path))
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, path, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.functions.heavy import heavy_hitters
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
base = spark.read.parquet(path)
base.count()  # warm the JVM + page cache so the window measures compute
t0 = time.time()
top = [(r["rank"], r["v"], r["n"]) for r in
       heavy_hitters(base, "v", k=20, capacity=4096).collect()]
wall = time.time() - t0
json.dump({"cores": cores, "wall_s": round(wall, 2), "top": top},
          open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/heavy_scaling", exist_ok=True)
    prep = "/tmp/heavy_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_ROWS), CORPUS], check=True)
    child = "/tmp/heavy_scaling/child.py"
    open(child, "w").write(_CHILD)
    results = {}
    for cores in sorted(LEVELS, reverse=True):
        out = f"/tmp/heavy_scaling/out_{cores}.json"
        subprocess.run(
            [sys.executable, child, str(cores), CORPUS, out], check=True
        )
        results[cores] = json.load(open(out))
        print(f"cores={cores} wall={results[cores]['wall_s']}s")
    lo, hi = min(LEVELS), max(LEVELS)
    same = results[lo]["top"] == results[hi]["top"]
    eff = results[lo]["wall_s"] / ((hi / lo) * results[hi]["wall_s"])
    report = {
        "n_rows": N_ROWS,
        "levels": {str(c): {"wall_s": results[c]["wall_s"]} for c in LEVELS},
        "results_identical_across_levels": same,
        "scaling_efficiency": round(eff, 3),
        "top1": results[hi]["top"][0],
    }
    with open("/root/repo/BENCH/evals/heavy_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/heavy_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
