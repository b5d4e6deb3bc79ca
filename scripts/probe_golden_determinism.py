#!/usr/bin/env python
"""Probe whether candidate golden-oracle slots are deterministic under
parallelism changes.

A committed golden parquet is only a sound driver oracle if the query's
output is identical regardless of partitioning/executor count (the driver
runs its own Spark conf). Runs each candidate slot at two deliberately
different (master, shuffle-partitions) configs in SEPARATE JVMs and
compares the full sorted outputs exactly (float bit patterns included).

Usage: python scripts/probe_golden_determinism.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CANDIDATES = json.loads(os.environ["GOLDEN_PROBE_CANDIDATES"]) if os.environ.get(
    "GOLDEN_PROBE_CANDIDATES"
) else [
    "suffix_shared_substrings",
    "g_dedup_censuses",
    "q_approx_distinct",
    "ann_topk_lsh",
]

_CHILD = r"""
import json, math, struct, sys
sys.path.insert(0, "/root/repo")
master, shuffle, sf_dir, out = sys.argv[1:5]
from hyrise_generalized_dedup_spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark(master=master, shuffle_partitions=int(shuffle))
# Driver gate names (union slots) plus every underlying component slot,
# so candidates can be named either way.
qs = dict(entry.queries())
for k, v in entry._full_registries()[0].items():
    qs.setdefault(k, v)
res = {}
def norm(v):
    if isinstance(v, float):
        return struct.pack("<d", v).hex()  # exact bit pattern
    return v
for name in json.load(open(sys.argv[5])):
    rows = qs[name](spark, sf_dir).collect()
    res[name] = sorted(tuple(norm(v) for v in r) for r in rows)
json.dump({k: [list(r) for r in v] for k, v in res.items()}, open(out, "w"))
spark.stop()
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.makedirs("/tmp/golden_probe", exist_ok=True)
    cand_f = "/tmp/golden_probe/cands.json"
    json.dump(CANDIDATES, open(cand_f, "w"))
    child = "/tmp/golden_probe/child.py"
    open(child, "w").write(_CHILD)
    outs = []
    for master, shuffle in [("local[4]", "4"), ("local[32]", "32")]:
        out = f"/tmp/golden_probe/out_{shuffle}.json"
        subprocess.run(
            [sys.executable, child, master, shuffle, sf_dir, out, cand_f],
            check=True,
        )
        outs.append(json.load(open(out)))
    a, b = outs
    ok = True
    for name in CANDIDATES:
        same = a[name] == b[name]
        ok &= same
        print(f"{name}: rows={len(a[name])} deterministic={same}")
        if not same:
            diff = [(x, y) for x, y in zip(a[name], b[name]) if x != y][:3]
            print("  first diffs:", diff)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
