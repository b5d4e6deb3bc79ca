#!/usr/bin/env python
"""Scaling probe for the serving-layer operators (greedy packing +
global stream offsets): identical jobs at two core counts in separate
JVMs over the SAME pre-materialized parquet corpus (synthesis excluded
from the measured window). Both operators are pure functions of
(doc_id, n_tokens, config), so an order-independent numeric fingerprint
of each result must be bit-identical across levels — any divergence is
a bug, not noise.

Usage: python scripts/serving_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
LEVELS = [2, 8]
CORPUS = "/tmp/serving_scaling/corpus"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_rows, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# deterministic variable-length docs: 0-199 tokens, avg ~100 (realistic
# short-doc regime where packing actually multi-packs)
(spark.range(n_rows).select(
    F.col("id").alias("doc_id"),
    F.repeat(F.lit("w "), (F.col("id") % 200).cast("int")).alias("text"))
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
from hyrise_generalized_dedup_spark.functions.pack import pack_table
from hyrise_generalized_dedup_spark.functions.shuffle import serving_offsets
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
base = spark.read.parquet(path)
base.count()  # warm the JVM + page cache so the window measures compute

t0 = time.time()
pfp = pack_table(base, capacity=2048, n_shards=64).agg(
    F.count("*"), F.sum("pack_n_tokens"), F.sum("pack_id"),
    F.sum("pack_offset"), F.max("pack_id"),
).collect()[0]
pack_wall = time.time() - t0

t0 = time.time()
ofp = serving_offsets(base).agg(
    F.count("*"), F.sum("srv_n_tokens"), F.sum("global_pos"),
    F.sum("global_token_offset"), F.max("global_token_offset"),
).collect()[0]
off_wall = time.time() - t0

json.dump({"cores": cores, "pack_wall_s": round(pack_wall, 2),
           "offsets_wall_s": round(off_wall, 2),
           "pack_fp": [int(x) for x in pfp],
           "offsets_fp": [int(x) for x in ofp]}, open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/serving_scaling", exist_ok=True)
    prep = "/tmp/serving_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_ROWS), CORPUS], check=True)
    child = "/tmp/serving_scaling/child.py"
    open(child, "w").write(_CHILD)
    results = {}
    for cores in sorted(LEVELS, reverse=True):
        out = f"/tmp/serving_scaling/out_{cores}.json"
        subprocess.run(
            [sys.executable, child, str(cores), CORPUS, out], check=True
        )
        results[cores] = json.load(open(out))
        print(
            f"cores={cores} pack={results[cores]['pack_wall_s']}s "
            f"offsets={results[cores]['offsets_wall_s']}s"
        )
    lo, hi = min(LEVELS), max(LEVELS)
    same = (
        results[lo]["pack_fp"] == results[hi]["pack_fp"]
        and results[lo]["offsets_fp"] == results[hi]["offsets_fp"]
    )
    ratio = hi / lo
    report = {
        "n_rows": N_ROWS,
        "levels": {
            str(c): {
                "pack_wall_s": results[c]["pack_wall_s"],
                "offsets_wall_s": results[c]["offsets_wall_s"],
            }
            for c in LEVELS
        },
        "results_identical_across_levels": same,
        "pack_scaling_efficiency": round(
            results[lo]["pack_wall_s"] / (ratio * results[hi]["pack_wall_s"]), 3
        ),
        "offsets_scaling_efficiency": round(
            results[lo]["offsets_wall_s"]
            / (ratio * results[hi]["offsets_wall_s"]),
            3,
        ),
        "pack_fp": results[hi]["pack_fp"],
    }
    with open("/root/repo/BENCH/evals/serving_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/serving_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
