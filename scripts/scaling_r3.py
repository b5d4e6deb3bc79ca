#!/usr/bin/env python
"""Round-3 scaling eval: 2M files, 2 vs 8 cores, min-of-3 per level.

Runs interleaved (8,2)x3 so an early estimate exists after one pair;
appends each run to BENCH/evals/r3_2m_runs.jsonl, then writes the
min-of-N report to BENCH/scaling.json (bench_scaling.py format).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo/scripts")
sys.argv = ["bench_scaling.py", "2000000"]
os.environ.setdefault("SCALING_LEVELS", "2,8")
import bench_scaling as bs  # noqa: E402

RUNS_PATH = "/root/repo/BENCH/evals/r3_2m_runs.jsonl"
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))


def main() -> None:
    bs.prepare_corpus()
    for rep in range(REPEATS):
        for cores in (8, 2):
            summary = bs.run_level(cores)
            summary["rep"] = rep
            with open(RUNS_PATH, "a") as fh:
                fh.write(json.dumps(summary, default=str) + "\n")
            print(
                f"rep={rep} cores={cores} wall={summary['pipeline_wall_ms']/1000:.1f}s "
                f"fps={summary['files_per_sec']}",
                flush=True,
            )
    best: dict[int, dict] = {}
    walls: dict[int, list[float]] = {2: [], 8: []}
    with open(RUNS_PATH) as fh:
        for line in fh:
            r = json.loads(line)
            c = int(r["cores"])
            walls[c].append(round(r["pipeline_wall_ms"] / 1000, 1))
            if c not in best or r["pipeline_wall_ms"] < best[c]["pipeline_wall_ms"]:
                best[c] = r
    t2 = best[2]["pipeline_wall_ms"] / 1000
    t8 = best[8]["pipeline_wall_ms"] / 1000
    eff = (t2 / t8) / 4
    report = {
        "n_files": 2_000_000,
        "with_suffix_stage": False,
        "levels": {
            str(c): {
                "pipeline_wall_s": best[c]["pipeline_wall_ms"] / 1000,
                "files_per_sec": best[c]["files_per_sec"],
                "all_walls_s": walls[c],
                "stage_walls_ms": {
                    k: v for k, v in best[c].items() if k.endswith("_wall_ms")
                },
            }
            for c in (2, 8)
        },
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open("/root/repo/BENCH/scaling.json", "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
