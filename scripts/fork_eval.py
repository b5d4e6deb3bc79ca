#!/usr/bin/env python
"""Repo-fork-detection scale + parallelism eval.

dedup/repos.py bounds its key self-join with a ubiquity census (keys in
more than `max_repos_per_key` repos are excluded), the same rule that
keeps the LSH star path linear. This script records the evidence at
load: repo_similarity over the N-file synthetic corpus PLUS a planted
fork pair (one repo's file set duplicated under a new repo name with
comment-prefix edits, so the normalized keys collide) and a planted
vendored blob shared by every repo (the quadratic hazard the census cap
removes).

Records, at TWO parallelism levels (FORK_LEVELS env, default "8,32"):
  * wall seconds for the full similarity table (min of FORK_REPS runs)
    — note the corpus is ~2N rows for N files (one vendored row per
    single-file repo), so walls measure the 2N-row table,
  * the pair-row count (must be identical across levels),
  * whether the planted fork is found via containment, and
  * a DIRECT ubiquity-cap check: repo_similarity over ONLY the
    vendored rows (one shared key across all N repos) must return
    zero pairs — if the cap broke, this is the subtable where the
    single hot key would join every repo pairwise.

Writes BENCH/evals/fork_eval_<N>.json and prints one JSON line.
Run: python scripts/fork_eval.py [N_FILES]   (default 200_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

LEVELS = [int(x) for x in os.environ.get("FORK_LEVELS", "8,32").split(",")]
REPS = int(os.environ.get("FORK_REPS", "2"))


def build_corpus(spark, n: int):
    from hyrise_generalized_dedup_spark.functions.code import normalized_sha
    from hyrise_generalized_dedup_spark.synth import generate_distributed

    base = generate_distributed(spark, n)
    # generate_distributed emits single-file repos, so the fork plant
    # builds its own multi-file victim: 30 base files re-homed under one
    # repo, then 27 of them forked with comment-prefix edits (normalized
    # keys still collide)
    victim = "victim/monorepo"
    victim_rows = (
        base.orderBy("repo")
        .limit(30)
        .withColumn("repo", F.lit(victim))
    )
    fork = (
        victim_rows.orderBy("path")
        .limit(27)
        .withColumn("repo", F.lit("fork/target"))
        .withColumn("content", F.concat(F.lit("// forked copy\n"), F.col("content")))
    )
    base = base.unionByName(victim_rows)
    # planted vendored blob: one identical file in EVERY repo — without
    # the ubiquity cap this single key joins all repos pairwise
    vendored = (
        base.select("repo")
        .distinct()
        .withColumn("path", F.lit("vendor/lib.js"))
        .withColumn("commit", F.lit("v1"))
        .withColumn("lang", F.lit("js"))
        .withColumn("content", F.lit("/* vendored minified lib */ var x=1;"))
    )
    corpus = base.unionByName(fork).unionByName(vendored)
    return (
        corpus.withColumn("file_key", normalized_sha(F.col("content"))),
        victim,
    )


def run_level(cores: int, n: int) -> dict:
    from hyrise_generalized_dedup_spark.dedup.repos import (
        fork_candidates,
        repo_similarity,
    )
    from hyrise_generalized_dedup_spark.session import get_spark

    spark = get_spark(
        app_name=f"fork-eval-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    files, victim = build_corpus(spark, n)
    files = files.persist()
    n_rows = files.count()
    # direct cap check on the hazardous subtable: every repo shares the
    # vendored key, so without the ubiquity cap this alone would emit
    # C(n_repos, 2) pairs
    vend_only = files.filter(F.col("path") == "vendor/lib.js")
    n_vendored_pairs = repo_similarity(vend_only, key_col="file_key").count()
    best, out = float("inf"), None
    for _ in range(REPS):
        t0 = time.time()
        sim = repo_similarity(files, key_col="file_key").persist()
        n_pairs = sim.count()
        wall = time.time() - t0
        if wall < best:
            top = (
                fork_candidates(sim, min_containment=0.8, min_shared=3)
                .orderBy(F.desc("containment"), F.desc("n_shared"))
                .limit(5)
                .collect()
            )
            fork_repo_pairs = sim.filter(
                (F.col("repo_a") == "fork/target") | (F.col("repo_b") == "fork/target")
            ).count()
            out = {
                "cores": cores,
                "n_rows": n_rows,
                "n_pairs": n_pairs,
                "wall_s": round(wall, 2),
                "fork_found": any(
                    victim in (r["repo_a"], r["repo_b"])
                    and "fork/target" in (r["repo_a"], r["repo_b"])
                    for r in top
                ),
                "pairs_touching_fork_repo": fork_repo_pairs,
                "vendored_only_pairs": n_vendored_pairs,
            }
            best = wall
        sim.unpersist()
    out["wall_s"] = round(best, 2)
    files.unpersist()
    spark.stop()
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    runs = [run_level(c, n) for c in sorted(LEVELS)]
    lo, hi = runs[0], runs[-1]
    report = {
        "eval": "repo_fork_detection",
        "n_files": n,
        "levels": runs,
        "same_output_rows": all(r["n_pairs"] == lo["n_pairs"] for r in runs),
        "speedup": round(lo["wall_s"] / hi["wall_s"], 3) if hi["wall_s"] else None,
        "planted_fork_found_all_levels": all(r["fork_found"] for r in runs),
        "ubiquity_cap_held": all(r["vendored_only_pairs"] == 0 for r in runs),
    }
    os.makedirs("/root/repo/BENCH/evals", exist_ok=True)
    path = f"/root/repo/BENCH/evals/fork_eval_{n}.json"
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
