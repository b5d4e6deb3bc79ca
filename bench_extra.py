#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): time named queries with the
noop sink so the computation — not the sink or the driver collect — is
measured. Does NOT replace bench.py (the frozen driver contract); used
for before/after evidence in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [--reps N] [--sf DIR] query [query ...]
Prints one JSON line: {"sf": ..., "reps": N, "queries": {name: best_sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from hyrise_generalized_dedup_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    qs, _ = entrymod._full_registries()
    qs["q6_filtered_revenue"](spark, args.sf).collect()  # warm the JVM/Arrow path

    timings = {}
    for name in args.queries:
        best = float("inf")
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
    print(json.dumps({"sf": args.sf, "reps": args.reps, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
