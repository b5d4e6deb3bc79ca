#!/usr/bin/env python
"""Scaling probe for the exact all-pairs Jaccard join: identical jobs at
two core counts in separate JVMs over the SAME pre-materialized parquet
corpus (synthesis + a warm-up count excluded), SYMMETRIC min-of-2 reps
per level. The corpus is family-structured (5 members per family with
family-unique rare tokens + corpus-wide stopwords), so qualifying pairs
are exactly the 10 within-family pairs per family — output linear in N,
measuring the operator, not a quadratic pair explosion. The surface is
exact integers, so the order-free fingerprint (pair count + inter /
union / key sums) must be bit-identical across reps AND levels.

Usage: python scripts/allpairs_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
LEVELS = [2, 8]
REPS = 2
CORPUS = "/tmp/allpairs_scaling/corpus"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_docs, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# doc i: family f = i div 5, member m = i mod 5. Text = 3 corpus-wide
# stopwords + 11 of the family's 12 tokens (member m drops token m) + a
# member-unique variant token -> within-family Jaccard 10/14..11/13,
# cross-family overlap = stopwords only (excluded by the threshold).
df = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(" ",
        F.lit("the of and"),
        F.concat(F.lit("v"), F.col("id")),
        *[F.when(F.col("id") % 5 != i,
                 F.concat(F.lit("f"), (F.col("id") / 5).cast("bigint"),
                          F.lit("_t"), F.lit(i))).otherwise(F.lit(""))
          for i in range(12)],
    ).alias("text"))
df.repartition(48).write.mode("overwrite").parquet(path)
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, path, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.dedup.allpairs import all_pairs_jaccard
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
docs = spark.read.parquet(path)
docs.count()  # warm the JVM + page cache so the window measures compute

t0 = time.time()
pairs = all_pairs_jaccard(docs, threshold_pm=700)
fp = pairs.agg(
    F.count("*").alias("n"),
    F.sum(F.col("doc_a") * 7 + F.col("doc_b") * 3).alias("ksum"),
    F.sum("inter_tokens").alias("isum"),
    F.sum("union_tokens").alias("usum"),
    F.sum("jaccard_pm").alias("jsum"),
).collect()[0]
wall = time.time() - t0

json.dump({"cores": cores, "allpairs_wall_s": round(wall, 2),
           "fp": [int(x) for x in fp]}, open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/allpairs_scaling", exist_ok=True)
    prep = "/tmp/allpairs_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_DOCS), CORPUS], check=True)
    child = "/tmp/allpairs_scaling/child.py"
    open(child, "w").write(_CHILD)
    walls: dict[int, list[float]] = {c: [] for c in LEVELS}
    fps: dict[int, list] = {}
    for rep in range(REPS):
        for cores in sorted(LEVELS, reverse=True):
            out = f"/tmp/allpairs_scaling/out_{cores}_{rep}.json"
            subprocess.run(
                [sys.executable, child, str(cores), CORPUS, out], check=True
            )
            r = json.load(open(out))
            walls[cores].append(r["allpairs_wall_s"])
            fps.setdefault(cores, r["fp"])
            if fps[cores] != r["fp"]:
                raise SystemExit(f"fingerprint diverged across reps at {cores} cores")
            print(f"rep={rep} cores={cores} wall={r['allpairs_wall_s']}s fp={r['fp'][:2]}")
    lo, hi = min(LEVELS), max(LEVELS)
    same = fps[lo] == fps[hi]
    ratio = hi / lo
    report = {
        "n_docs": N_DOCS,
        "reps_per_level": REPS,
        "levels": {
            str(c): {"all_walls_s": walls[c], "min_wall_s": min(walls[c])}
            for c in LEVELS
        },
        "results_identical_across_levels_and_reps": same,
        "n_pairs": fps[lo][0],
        "allpairs_scaling_efficiency": round(
            min(walls[lo]) / (ratio * min(walls[hi])), 3
        ),
    }
    with open("/root/repo/BENCH/evals/allpairs_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/allpairs_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
