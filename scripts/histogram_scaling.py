#!/usr/bin/env python
"""Scaling probe for the distributed EqualDistinctCountHistogram build:
identical jobs at two core counts in separate JVMs over the SAME
pre-materialized parquet corpus (synthesis + a warm-up count excluded
from the measured window), SYMMETRIC min-of-2 reps per level. The bins
are exact integers over untouched source values, so the collected result
must be bit-identical across reps AND levels.

Usage: python scripts/histogram_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
LEVELS = [2, 8]
REPS = 2
CORPUS = "/tmp/hist_scaling/corpus"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_rows, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# skewed int key (~1M distinct, zipf-ish via modular squares) + a dense
# double column; both deterministic functions of the row id
(spark.range(n_rows).select(
    F.col("id"),
    F.pmod(F.col("id") * F.col("id") + F.col("id") * 2654435761,
           F.lit(1_000_003)).alias("k_int"),
    (F.pmod(F.col("id") * 48271, F.lit(2147483647)).cast("double")
     / 1e6).alias("v_dbl"))
 .repartition(48)
 .write.mode("overwrite").parquet(path))
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, path, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.stats import edc_histogram_bins
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
base = spark.read.parquet(path)
base.count()  # warm the JVM + page cache so the window measures compute

t0 = time.time()
b_int = [tuple(r) for r in edc_histogram_bins(base, "k_int", 64).collect()]
b_dbl = [tuple(r) for r in edc_histogram_bins(base, "v_dbl", 64).collect()]
wall = time.time() - t0

json.dump({"cores": cores, "hist_wall_s": round(wall, 2),
           "fp": [[int(a), int(b), int(c), int(d), int(e)] for a, b, c, d, e in b_int]
                 + [[int(a), repr(b), repr(c), int(d), int(e)] for a, b, c, d, e in b_dbl]},
          open(out, "w"), default=str)
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/hist_scaling", exist_ok=True)
    prep = "/tmp/hist_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_ROWS), CORPUS], check=True)
    child = "/tmp/hist_scaling/child.py"
    open(child, "w").write(_CHILD)
    walls: dict[int, list[float]] = {c: [] for c in LEVELS}
    fps: dict[int, list] = {}
    for rep in range(REPS):
        for cores in sorted(LEVELS, reverse=True):
            out = f"/tmp/hist_scaling/out_{cores}_{rep}.json"
            subprocess.run(
                [sys.executable, child, str(cores), CORPUS, out], check=True
            )
            r = json.load(open(out))
            walls[cores].append(r["hist_wall_s"])
            fps.setdefault(cores, r["fp"])
            if fps[cores] != r["fp"]:
                raise SystemExit(f"fingerprint diverged across reps at {cores} cores")
            print(f"rep={rep} cores={cores} wall={r['hist_wall_s']}s")
    lo, hi = min(LEVELS), max(LEVELS)
    same = fps[lo] == fps[hi]
    ratio = hi / lo
    report = {
        "n_rows": N_ROWS,
        "reps_per_level": REPS,
        "levels": {
            str(c): {"all_walls_s": walls[c], "min_wall_s": min(walls[c])}
            for c in LEVELS
        },
        "results_identical_across_levels_and_reps": same,
        "hist_scaling_efficiency": round(
            min(walls[lo]) / (ratio * min(walls[hi])), 3
        ),
    }
    with open("/root/repo/BENCH/evals/histogram_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/hist_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
