#!/usr/bin/env python
"""Measure the box's pure-CPU scaling ceiling at N vs 4N processes.

The sandbox VM throttles above ~24 sustained threads and has noisy
neighbors, so pipeline scaling efficiency must be judged against what the
HARDWARE can do, not against an ideal 4.0x. This burn loop is pure
numpy/hashlib compute (no IO, no IPC beyond process start), so its N->4N
efficiency is the ceiling any 4N-way job can reach on this box.

Usage: python scripts/hw_ceiling.py [N] [4N]   (defaults 4 16)
Writes BENCH/hw_ceiling.json with a timestamp so scaling runs can prove
the ceiling was measured the same day.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import multiprocessing as mp
import sys
import time

WORK_UNITS_PER_PROC = 40
# A probe whose per-level wall is a few seconds measures VM noise, not a
# ceiling (round-4 probe: 8 s walls -> nonsense 1.085 "efficiency").
# Calibrate units so each level burns at least this long.
MIN_WALL_S = 60.0


def _burn(units: int) -> int:
    acc = 0
    for u in range(units):
        h = hashlib.sha256(f"unit{u}".encode()).digest()
        for _ in range(400000):
            h = hashlib.sha256(h).digest()
        acc ^= h[0]
    return acc


def run_level(n_procs: int, units: int) -> float:
    t0 = time.time()
    with mp.Pool(n_procs) as pool:
        pool.map(_burn, [units] * n_procs)
    return time.time() - t0


def calibrate(lo: int) -> int:
    """Scale WORK_UNITS_PER_PROC so the low level burns >= MIN_WALL_S."""
    probe = run_level(lo, WORK_UNITS_PER_PROC)
    if probe >= MIN_WALL_S:
        return WORK_UNITS_PER_PROC
    import math

    return math.ceil(WORK_UNITS_PER_PROC * MIN_WALL_S / max(probe, 0.1) * 1.1)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    units = calibrate(lo)
    # The calibration probe runs colder (frequency ramp, page-cache warmup)
    # than the recorded runs, so enforce MIN_WALL_S on the RECORDED walls:
    # if the warmed-up min comes in short, scale units and measure again.
    while True:
        # min-of-2 per level: noisy neighbors
        t_lo = min(run_level(lo, units) for _ in range(2))
        t_hi = min(run_level(hi, units) for _ in range(2))
        shortest = min(t_lo, t_hi)
        if shortest >= MIN_WALL_S:
            break
        import math

        units = math.ceil(units * MIN_WALL_S / max(shortest, 0.1) * 1.15)
    # total work scales with proc count, so perfect scaling means equal
    # wall time; speedup for FIXED work = (t_lo * lo proportionality):
    # each level does n_procs * WORK_UNITS, so fixed-work speedup =
    # (hi/lo) * (t_lo / t_hi) and efficiency = t_lo / t_hi.
    eff = t_lo / t_hi
    report = {
        "measured_at": datetime.datetime.now().isoformat(timespec="seconds"),
        "levels": [lo, hi],
        "wall_s": {str(lo): round(t_lo, 2), str(hi): round(t_hi, 2)},
        "work_units_per_proc": units,
        "ceiling_efficiency": round(eff, 3),
        "fixed_work_speedup": round((hi / lo) * eff, 2),
    }
    with open("/root/repo/BENCH/hw_ceiling.json", "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
