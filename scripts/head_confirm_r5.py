#!/usr/bin/env python
"""Round-5 HEAD confirmation run for the 2M suffix-inclusive eval.

The recorded min-of-3 eval (BENCH/scaling_suffix.json) was measured on
the round-4 tree; round 5 changed pipeline internals (driver-side
union-find fast path for small component graphs, incremental-update
plumbing). Pipeline outputs are pytest-proven bit-identical, so the
scaling RATIO argument carries over; this script re-measures the 8-core
wall on HEAD to evidence that throughput did not regress (the union-find
change removes level-independent flat time, which can only raise the
measured efficiency). Appends runs to BENCH/evals/r5_head_runs.jsonl.

Usage: python scripts/head_confirm_r5.py [cores] [reps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo/scripts")
_CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
_REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
sys.argv = ["bench_scaling.py", "2000000", "--suffix"]
os.environ.setdefault("SCALING_LEVELS", "2,8")
import bench_scaling as bs  # noqa: E402

RUNS_PATH = "/root/repo/BENCH/evals/r5_head_runs.jsonl"


def main() -> None:
    cores, reps = _CORES, _REPS
    bs.prepare_corpus()
    for _ in range(reps):
        r = bs.run_level(cores)
        r["tree"] = "r5-head"
        with open(RUNS_PATH, "a") as fh:
            fh.write(json.dumps(r) + "\n")
        print(json.dumps({k: r[k] for k in ("cores", "pipeline_wall_ms", "files_per_sec")}))


if __name__ == "__main__":
    main()
