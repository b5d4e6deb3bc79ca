#!/usr/bin/env python
"""Scaling probe for cross-corpus fuzzy decontamination (dedup/xcorpus.py):
identical jobs at two core counts in separate JVMs over the SAME
pre-materialized parquet corpora (synthesis and a warm-up count excluded
from the measured window — the serving_scaling.py protocol). The surface
is exact integers, so an order-independent numeric fingerprint of the
verified pair set must be bit-identical across levels.

The measured job is the operator end to end: train signatures (map-only
Arrow pass), broadcast eval band index, candidate distinct(), exact
verify with broadcast candidates + eval texts. The train side is the
scaling axis (eval sets stay small in production); planted eval docs are
exact and truncated copies of train docs so verification does real work
at J=1000 and J<1000.

Usage: python scripts/xcorpus_scaling.py [n_train_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
LEVELS = [2, 8]
TRAIN = "/tmp/xcorpus_scaling/train"
EVAL = "/tmp/xcorpus_scaling/eval"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_rows, train_path, eval_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# deterministic docs, each made UNIQUE by a leading d<id> token so only
# planted eval copies collide; 20-70 tokens from a 1000-word vocabulary
def doc_text(idcol):
    return F.concat(
        F.lit("d"), idcol.cast("string"), F.lit(" "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (idcol % 50 + 20).cast("int")),
                lambda i: F.concat(
                    F.lit("w"), F.pmod(idcol * 31 + i * 7, F.lit(1000))
                ),
            ),
            " ",
        ),
    )
train = spark.range(n_rows).select(
    F.col("id").alias("train_id"), doc_text(F.col("id")).alias("content")
)
train.repartition(48).write.mode("overwrite").parquet(train_path)
# eval: one doc per 1000 train ids — even slots exact copies, odd slots
# truncated copies (first 14 chars dropped -> high-but-<1000 Jaccard)
ev = spark.range(n_rows // 1000).select(
    (F.col("id") * 1000).alias("src_id"), F.col("id").alias("eval_id")
)
ev = ev.select(
    "eval_id",
    F.when(
        F.col("eval_id") % 2 == 0, doc_text(F.col("src_id"))
    ).otherwise(F.substring(doc_text(F.col("src_id")), 15, 1 << 20)).alias("content"),
)
ev.coalesce(1).write.mode("overwrite").parquet(eval_path)
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, train_path, eval_path, out = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4])
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.config import GDConfig
from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.dedup.xcorpus import fuzzy_pairs
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
train = spark.read.parquet(train_path)
ev = spark.read.parquet(eval_path)
train.count(); ev.count()  # warm JVM + page cache

t0 = time.time()
fp = fuzzy_pairs(
    train, ev, GDConfig(), train_key="train_id", eval_key="eval_id",
    threshold_pm=700,
).agg(
    F.count("*"), F.sum("train_id"), F.sum("eval_id"),
    F.sum("inter_shingles"), F.sum("union_shingles"), F.sum("jaccard_pm"),
).collect()[0]
wall = time.time() - t0

json.dump({"cores": cores, "xcorpus_wall_s": round(wall, 2),
           "xcorpus_fp": [int(x) for x in fp]}, open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/xcorpus_scaling", exist_ok=True)
    prep = "/tmp/xcorpus_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_ROWS), TRAIN, EVAL], check=True)
    child = "/tmp/xcorpus_scaling/child.py"
    open(child, "w").write(_CHILD)
    results = {}
    for cores in sorted(LEVELS, reverse=True):
        out = f"/tmp/xcorpus_scaling/out_{cores}.json"
        subprocess.run(
            [sys.executable, child, str(cores), TRAIN, EVAL, out], check=True
        )
        results[cores] = json.load(open(out))
        print(f"cores={cores} xcorpus={results[cores]['xcorpus_wall_s']}s")
    lo, hi = min(LEVELS), max(LEVELS)
    same = results[lo]["xcorpus_fp"] == results[hi]["xcorpus_fp"]
    ratio = hi / lo
    report = {
        "n_train_rows": N_ROWS,
        "n_eval_rows": N_ROWS // 1000,
        "levels": {
            str(c): {"xcorpus_wall_s": results[c]["xcorpus_wall_s"]}
            for c in LEVELS
        },
        "results_identical_across_levels": same,
        "xcorpus_scaling_efficiency": round(
            results[lo]["xcorpus_wall_s"] / (ratio * results[hi]["xcorpus_wall_s"]), 3
        ),
        "xcorpus_fp": results[hi]["xcorpus_fp"],
    }
    with open("/root/repo/BENCH/evals/xcorpus_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/xcorpus_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
