#!/usr/bin/env python
"""Scaling probe for the trained quality classifier
(functions/classifier.py): identical train-and-score jobs at two core
counts in separate JVMs over the SAME pre-materialized parquet corpus
(synthesis and a warm-up count excluded from the measured window — the
serving_scaling.py protocol). Training is bit-deterministic by
construction (exact integer gradient aggregation), so both the final
weight vector and an order-independent integer fingerprint of the scored
surface must be IDENTICAL across levels — asserted, not assumed.

The measured job is the operator end to end: hashed feature packing
(map-only: JVM hash transform + vectorized Arrow count kernel — zero
shuffles), 24 full-batch GD iterations (map-only Arrow passes, gradient
folded exactly on the driver), and the scoring pass.

Usage: python scripts/classifier_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
LEVELS = [2, 8]
CORPUS = "/tmp/classifier_scaling/docs"

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
n_rows, path = int(sys.argv[1]), sys.argv[2]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=24)
# Deterministic 3-way corpus: id%3==0 stopword-dense (confident positive),
# id%3==1 stopword-free (confident negative), id%3==2 in the 45-80 pm gap
# (unlabeled -> scored only). Content words come from a 1000-word
# vocabulary so the hashed model learns a real distribution.
def words(idcol, n):
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(F.lit("w"), F.pmod(idcol * 31 + i * 7, F.lit(1000))),
    )
n_content = (F.col("id") % 40 + 20).cast("int")
body = words(F.col("id"), n_content)
sw = F.when(F.col("id") % 3 == 0, F.lit(4)).otherwise(
    F.when(F.col("id") % 3 == 1, F.lit(0)).otherwise(F.lit(2)))
# 4 stopwords over 20-60 content words -> 62-166 pm (dense); 2 -> 32-90 pm
# straddles the gap; clamp the dense/gap classes by sizing content:
# dense: 4/(n+4) >= 80pm needs n <= 46 -> use n%27+20 (20..46)
n_dense = (F.col("id") % 27 + 20).cast("int")
# gap: 45pm < 2/(n+2) < 80pm needs 23 <= n <= 42 -> n%20+23
n_gap = (F.col("id") % 20 + 23).cast("int")
text = F.when(
    F.col("id") % 3 == 0,
    F.array_join(F.concat(F.array(F.lit("a"), F.lit("the"), F.lit("a"),
                                  F.lit("the")), words(F.col("id"), n_dense)), " "),
).when(
    F.col("id") % 3 == 1, F.array_join(body, " ")
).otherwise(
    F.array_join(F.concat(F.array(F.lit("a"), F.lit("the")),
                          words(F.col("id"), n_gap)), " ")
)
spark.range(n_rows).select(F.col("id").alias("doc_id"), text.alias("text")) \
    .repartition(48).write.mode("overwrite").parquet(path)
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, path, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from pyspark.sql import functions as F
from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.functions.classifier import (
    csr_blobs, packed_features, train_logreg, score_logreg,
    stopword_weak_label)
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=3 * cores)
docs = spark.read.parquet(path)
docs.count()  # warm JVM + page cache

t0 = time.time()
packed = csr_blobs(
    packed_features(docs, stopword_weak_label())
).coalesce(cores).persist()
w = train_logreg(packed)
fp = score_logreg(packed, w).agg(
    F.count("*"), F.sum("doc_id"), F.sum("label"),
    F.sum("margin_fp"), F.sum("pred"), F.sum(F.col("doc_id") * F.col("pred")),
).collect()[0]
wall = time.time() - t0

json.dump({"cores": cores, "clf_wall_s": round(wall, 2),
           "weights": [float(x) for x in w],
           "clf_fp": [int(x) for x in fp]}, open(out, "w"))
spark.stop()
"""


def main() -> None:
    os.makedirs("/tmp/classifier_scaling", exist_ok=True)
    prep = "/tmp/classifier_scaling/prep.py"
    open(prep, "w").write(_PREP)
    subprocess.run([sys.executable, prep, str(N_ROWS), CORPUS], check=True)
    child = "/tmp/classifier_scaling/child.py"
    open(child, "w").write(_CHILD)
    # SYMMETRIC min-of-REPS at both levels (the round-4 verdict's protocol
    # lesson: asymmetric reps bias the ratio; min-of-N is only fair when N
    # matches across levels).
    reps = int(os.environ.get("CLF_SCALING_REPS", "2"))
    results: dict[int, dict] = {}
    walls: dict[int, list[float]] = {c: [] for c in LEVELS}
    for r in range(reps):
        for cores in sorted(LEVELS, reverse=True):
            out = f"/tmp/classifier_scaling/out_{cores}_{r}.json"
            subprocess.run(
                [sys.executable, child, str(cores), CORPUS, out], check=True
            )
            run = json.load(open(out))
            walls[cores].append(run["clf_wall_s"])
            prev = results.get(cores)
            if prev is not None:  # bit-equality across reps AND levels
                assert prev["clf_fp"] == run["clf_fp"]
                assert prev["weights"] == run["weights"]
            if prev is None or run["clf_wall_s"] < prev["clf_wall_s"]:
                results[cores] = run
            print(f"rep={r} cores={cores} classifier={run['clf_wall_s']}s")
    lo, hi = min(LEVELS), max(LEVELS)
    same = (
        results[lo]["clf_fp"] == results[hi]["clf_fp"]
        and results[lo]["weights"] == results[hi]["weights"]
    )
    ratio = hi / lo
    report = {
        "n_rows": N_ROWS,
        "reps_per_level": reps,
        "levels": {
            str(c): {
                "clf_wall_s": results[c]["clf_wall_s"],
                "all_rep_walls_s": walls[c],
            }
            for c in LEVELS
        },
        "weights_and_scores_identical_across_levels": same,
        "clf_scaling_efficiency": round(
            results[lo]["clf_wall_s"] / (ratio * results[hi]["clf_wall_s"]), 3
        ),
        "clf_fp": results[hi]["clf_fp"],
    }
    with open("/root/repo/BENCH/evals/classifier_scaling.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    shutil.rmtree("/tmp/classifier_scaling", ignore_errors=True)
    if not same:
        raise SystemExit("results diverged across core counts")


if __name__ == "__main__":
    main()
