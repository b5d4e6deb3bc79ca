#!/usr/bin/env python
"""Skew-robustness eval: the pipeline under a pathological hot LSH family.

The north rule demands EXPLICIT skew handling (salted repartitioning of
hot bands, AQE backstop). The mechanism is pytest-gated for precision
(planted hot-bucket fixture, tests/test_neardup.py); this script records
the PERFORMANCE evidence at load: the same pipeline runs over

  normal : the standard synthetic code corpus (N files), and
  skewed : 90% of that corpus + a planted NEAR-dup family of 10% of N
           documents — single-line variants of one base file, so they
           survive exact-signature rep pre-dedup and all land in the
           same LSH band buckets (one bucket of ~N/10 members per band).

Without the hot-bucket star path, each of the 16 bands would emit
C(N/10, 2) candidate pairs (~2x10^8 at N=200k, x16 bands); with it the
family costs O(members) per band. The eval records wall times and the
candidate/edge counts for both corpora and asserts

  * candidate pairs grow sub-quadratically (pairs_skewed is within
    STAR_FACTOR x the linear budget n_files * bands, not the quadratic
    blowup), and
  * wall_skewed / wall_normal <= WALL_FACTOR (default 2.0) — the skewed
    corpus costs at most a constant factor, not a cluster-killing tail.

Writes BENCH/evals/skew_eval_<N>.json and prints one JSON line.
Run: python scripts/skew_eval.py [N_FILES]   (default 200_000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

WALL_FACTOR = float(os.environ.get("SKEW_WALL_FACTOR", "2.0"))
STAR_FACTOR = float(os.environ.get("SKEW_STAR_FACTOR", "8.0"))


def planted_family(spark, n: int, base_index: int):
    """n near-dup variants (one unique trailing line each) of one base
    file, with identities disjoint from generate_distributed's ranges."""
    from hyrise_generalized_dedup_spark.synth import _gen_file
    import random

    base = _gen_file(random.Random(777), "py", 60)
    # three high-entropy trailing lines: enough distinct shingles that the
    # variants do NOT collapse to one exact minhash signature at the rep
    # pre-dedup stage (that would dodge the band skew this eval plants),
    # yet Jaccard vs base stays ~0.96 so every band bucket goes hot
    tail = F.concat(
        F.lit("\n# variant "), F.col("id").cast("string"),
        F.lit("\n# nonce "), F.sha2(F.concat(F.lit("a"), F.col("id").cast("string")), 256),
        F.lit("\n# salt "), F.sha2(F.concat(F.lit("b"), F.col("id").cast("string")), 256),
    )
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("hotorg/repo"), (F.col("id") % 37).cast("string")).alias("repo"),
            F.concat(F.lit(f"src/hot_{base_index}_"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
            F.sha2(F.concat(F.lit("hot"), F.col("id").cast("string")), 256).substr(1, 16).alias("commit"),
            F.lit("py").alias("lang"),
            F.concat(F.lit(base), tail).alias("content"),
        )
    )


def run_once(spark, corpus, tag: str) -> dict:
    from hyrise_generalized_dedup_spark.dedup.pipeline import run_pipeline

    out = f"/tmp/skew_eval_{tag}_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    summary = run_pipeline(spark, corpus, out, resume=False, with_suffix_stage=True)
    wall = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return {
        "wall_s": round(wall, 1),
        "n_files": summary["n_files"],
        "n_candidate_pairs": summary["n_candidate_pairs"],
        "n_star_candidates": summary["n_star_candidates"],
        "n_edges": summary["n_edges"],
        "n_clusters": summary["n_clusters"],
        "files_per_sec": round(summary["n_files"] / wall, 1),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from hyrise_generalized_dedup_spark.config import GDConfig
    from hyrise_generalized_dedup_spark.session import get_spark
    from hyrise_generalized_dedup_spark.synth import generate_distributed

    spark = get_spark(app_name="skew_eval", master=f"local[{cpus}]", shuffle_partitions=cpus)
    n_hot = n // 10
    normal = generate_distributed(spark, n).repartition(cpus * 4).persist()
    skewed = (
        generate_distributed(spark, n - n_hot)
        .unionByName(planted_family(spark, n_hot, base_index=n))
        .repartition(cpus * 4)
        .persist()
    )
    normal.count(), skewed.count()

    res = {"n_files": n, "n_hot_family": n_hot, "bands": GDConfig().bands}
    res["normal"] = run_once(spark, normal, "normal")
    res["skewed"] = run_once(spark, skewed, "skewed")

    bands = res["bands"]
    linear_budget = n * bands * STAR_FACTOR
    quadratic = (n_hot * (n_hot - 1)) // 2  # per band, without the star path
    res["wall_ratio"] = round(res["skewed"]["wall_s"] / res["normal"]["wall_s"], 3)
    res["pairs_vs_linear_budget"] = round(res["skewed"]["n_candidate_pairs"] / linear_budget, 4)
    res["pairs_vs_one_band_quadratic"] = round(res["skewed"]["n_candidate_pairs"] / quadratic, 6)
    res["pass"] = bool(
        res["skewed"]["n_candidate_pairs"] <= linear_budget
        and res["wall_ratio"] <= WALL_FACTOR
        and res["skewed"]["n_star_candidates"] > 0
    )

    os.makedirs("/root/repo/BENCH/evals", exist_ok=True)
    path = f"/root/repo/BENCH/evals/skew_eval_{n}.json"
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()
    sys.exit(0 if res["pass"] else 1)


if __name__ == "__main__":
    main()
