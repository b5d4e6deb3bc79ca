#!/usr/bin/env python
"""Scaling probe for the bigram-LM perplexity filter: identical job at
two core counts in separate JVMs over the SAME pre-materialized parquet
corpus (synthesis excluded from the measured window). The measured job is
the full operator — model training (two groupBys over the reference
half), the two model joins, and the per-doc score aggregate — collapsed
to a corpus-level integer census so the cross-level equality check is
exact (every gate column is an integer; any divergence is a bug).

Usage: python scripts/lm_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
LEVELS = [2, 8]
CORPUS = "/tmp/lm_scaling/corpus"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_docs, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# deterministic zipf-ish corpus: 50 words/doc; 70% of positions draw from
# a 200-word head, the rest from a 20k tail — a natural-language-shaped
# vocabulary so the model tables stay broadcast-sized like real text
words = F.transform(
    F.sequence(F.lit(1), F.lit(50)),
    lambda i: F.concat(
        F.lit("w"),
        F.when(F.pmod(F.hash(F.col("id") * 97 + i * 13), 10) < 7,
               F.pmod(F.hash(F.col("id") * 31 + i * 7), 200))
        .otherwise(F.pmod(F.hash(F.col("id") * 61 + i * 3), 20000) + 1000),
    ),
)
(spark.range(n_docs)
 .select(F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text"))
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
from hyrise_generalized_dedup_spark.functions.lm import lm_score_table
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
base = spark.read.parquet(path)
base.count()  # warm the JVM + page cache so the window measures compute
t0 = time.time()
census = lm_score_table(base).agg(
    F.count("*").alias("n_docs"),
    F.sum("n_bigrams").alias("sum_bigrams"),
    F.sum("n_oov_bigrams").alias("sum_oov"),
    F.sum("sum_pair_c").alias("sum_pair_c"),
    F.sum("sum_ctx_c").alias("sum_ctx_c"),
    F.sum(F.col("lm_keep").cast("long")).alias("n_keep"),
).collect()[0]
wall = time.time() - t0
json.dump({"cores": cores, "wall_s": round(wall, 2),
           "census": {k: census[k] for k in census.asDict()}},
          open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/lm_scaling", exist_ok=True)
    prep = "/tmp/lm_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_DOCS), CORPUS], check=True)
    child = "/tmp/lm_scaling/child.py"
    open(child, "w").write(_CHILD)
    results = {}
    for cores in sorted(LEVELS, reverse=True):
        out = f"/tmp/lm_scaling/out_{cores}.json"
        subprocess.run(
            [sys.executable, child, str(cores), CORPUS, out], check=True
        )
        results[cores] = json.load(open(out))
        print(f"cores={cores} wall={results[cores]['wall_s']}s")
    lo, hi = min(LEVELS), max(LEVELS)
    same = results[lo]["census"] == results[hi]["census"]
    eff = results[lo]["wall_s"] / ((hi / lo) * results[hi]["wall_s"])
    report = {
        "n_docs": N_DOCS,
        "levels": {str(c): {"wall_s": results[c]["wall_s"]} for c in LEVELS},
        "census_identical_across_levels": same,
        "scaling_efficiency": round(eff, 3),
        "census": results[hi]["census"],
    }
    with open("/root/repo/BENCH/evals/lm_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/lm_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("census diverged across core counts")


if __name__ == "__main__":
    main()
