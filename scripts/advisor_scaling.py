#!/usr/bin/env python
"""Scaling probe for the encoding advisor: identical jobs at two core
counts in separate JVMs over the SAME pre-materialized parquet corpus
(synthesis + a warm-up count excluded from the measured window),
SYMMETRIC min-of-2 reps per level. The advisor's whole surface is exact
integer byte sizes, so the order-free fingerprint (per-column-per-
encoding size sums + chosen censuses) must be bit-identical across reps
AND levels.

Usage: python scripts/advisor_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
LEVELS = [2, 8]
REPS = 2
CORPUS = "/tmp/advisor_scaling/corpus"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_rows, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# rid is the chunk ordering; vi cycles through a small per-chunk value
# set (dictionary-friendly), s is a 13-value string cycle with nulls,
# vl is high-cardinality (unencoded-friendly) — all deterministic in id
(spark.range(n_rows).select(
    F.col("id").alias("rid"),
    F.pmod(F.col("id") * 2654435761 + 11, F.lit(97)).cast("int").alias("vi"),
    F.when(F.col("id") % 17 == 0, None)
     .otherwise(F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(13)))).alias("s"),
    F.pmod(F.col("id") * 48271, F.lit(1_000_003)).alias("vl"))
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
from hyrise_generalized_dedup_spark.sources.advisor import advise_encodings
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
base = spark.read.parquet(path)
base.count()  # warm the JVM + page cache so the window measures compute

t0 = time.time()
adv = advise_encodings(
    base, "rid", 4096, {"vi": "int", "s": "string", "vl": "long"}
)
fp = (adv.groupBy("column_name", "encoding")
        .agg(F.sum("size_in_bytes").alias("bytes"),
             F.sum(F.col("chosen").cast("bigint")).alias("n_chosen"),
             F.count("*").alias("n_chunks"))
        .orderBy("column_name", "encoding")
        .collect())
wall = time.time() - t0

json.dump({"cores": cores, "advisor_wall_s": round(wall, 2),
           "fp": [[r[0], r[1], int(r[2]), int(r[3]), int(r[4])] for r in fp]},
          open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/advisor_scaling", exist_ok=True)
    prep = "/tmp/advisor_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_ROWS), CORPUS], check=True)
    child = "/tmp/advisor_scaling/child.py"
    open(child, "w").write(_CHILD)
    walls: dict[int, list[float]] = {c: [] for c in LEVELS}
    fps: dict[int, list] = {}
    for rep in range(REPS):
        for cores in sorted(LEVELS, reverse=True):
            out = f"/tmp/advisor_scaling/out_{cores}_{rep}.json"
            subprocess.run(
                [sys.executable, child, str(cores), CORPUS, out], check=True
            )
            r = json.load(open(out))
            walls[cores].append(r["advisor_wall_s"])
            fps.setdefault(cores, r["fp"])
            if fps[cores] != r["fp"]:
                raise SystemExit(f"fingerprint diverged across reps at {cores} cores")
            print(f"rep={rep} cores={cores} wall={r['advisor_wall_s']}s")
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
        "advisor_scaling_efficiency": round(
            min(walls[lo]) / (ratio * min(walls[hi])), 3
        ),
    }
    with open("/root/repo/BENCH/evals/advisor_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/advisor_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
