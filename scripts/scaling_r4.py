#!/usr/bin/env python
"""Round-4 scaling eval: the FULL 7-stage DAG (suffix stage included),
2M files, 2 vs 8 cores, min-of-N per level.

Round 3 measured raw 0.800 on the 6-stage DAG but excluded the suffix
stage; after the round-4 kernel vectorization this eval closes that gap
by measuring the now-default 7-stage pipeline end to end. Runs
interleaved (8,2) per rep so an early estimate exists after one pair;
appends each run to BENCH/evals/r4_2m_suffix_runs.jsonl, then writes the
min-of-N report to BENCH/scaling_suffix.json (bench_scaling.py format,
sibling of the no-suffix BENCH/scaling.json).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo/scripts")
sys.argv = ["bench_scaling.py", "2000000", "--suffix"]
os.environ.setdefault("SCALING_LEVELS", "2,8")
import bench_scaling as bs  # noqa: E402

RUNS_PATH = "/root/repo/BENCH/evals/r4_2m_suffix_runs.jsonl"
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))


def write_report() -> dict:
    # Level set derives from bench_scaling.LEVELS (SCALING_LEVELS env),
    # not a hardcoded {2, 8} — an override no longer KeyErrors here.
    lo, hi = min(bs.LEVELS), max(bs.LEVELS)
    best: dict[int, dict] = {}
    walls: dict[int, list[float]] = {c: [] for c in bs.LEVELS}
    with open(RUNS_PATH) as fh:
        for line in fh:
            r = json.loads(line)
            c = int(r["cores"])
            walls.setdefault(c, []).append(round(r["pipeline_wall_ms"] / 1000, 1))
            if c not in best or r["pipeline_wall_ms"] < best[c]["pipeline_wall_ms"]:
                best[c] = r
    if lo not in best or hi not in best:  # partial (first leg only): no ratio yet
        return {"partial": True, "have_levels": sorted(best)}
    t_lo = best[lo]["pipeline_wall_ms"] / 1000
    t_hi = best[hi]["pipeline_wall_ms"] / 1000
    eff = (t_lo / t_hi) / (hi / lo)
    report = {
        "n_files": 2_000_000,
        "with_suffix_stage": True,
        "reps_per_level": {str(c): len(walls.get(c, [])) for c in sorted(walls)},
        "levels": {
            str(c): {
                "pipeline_wall_s": best[c]["pipeline_wall_ms"] / 1000,
                "files_per_sec": best[c]["files_per_sec"],
                "all_walls_s": walls[c],
                "stage_walls_ms": {
                    k: v for k, v in best[c].items() if k.endswith("_wall_ms")
                },
            }
            for c in (lo, hi)
        },
        "suffix_stage_ratio": (
            round(best[lo]["suffix_wall_ms"] / best[hi]["suffix_wall_ms"], 2)
            if best.get(lo, {}).get("suffix_wall_ms") and best.get(hi, {}).get("suffix_wall_ms")
            else None
        ),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open("/root/repo/BENCH/scaling_suffix.json", "w") as fh:
        json.dump(report, fh, indent=2)
    return report


def main() -> None:
    bs.prepare_corpus()
    done = 0
    if os.path.exists(RUNS_PATH):
        done = sum(1 for _ in open(RUNS_PATH))
    for rep in range(REPEATS):
        for cores in sorted(bs.LEVELS, reverse=True):
            if done > 0:  # resume: skip runs already recorded
                done -= 1
                continue
            summary = bs.run_level(cores)
            summary["rep"] = rep
            with open(RUNS_PATH, "a") as fh:
                fh.write(json.dumps(summary, default=str) + "\n")
            print(
                f"rep={rep} cores={cores} wall={summary['pipeline_wall_ms']/1000:.1f}s "
                f"fps={summary['files_per_sec']} "
                f"suffix={summary.get('suffix_wall_ms', 0)/1000:.1f}s",
                flush=True,
            )
            print(json.dumps(write_report()), flush=True)


if __name__ == "__main__":
    main()
