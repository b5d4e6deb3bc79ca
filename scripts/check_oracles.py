#!/usr/bin/env python
"""Run every queries() entry against its oracle_sql() via DuckDB — the same
comparison the driver does — and report per-query pass/fail.

Usage: python scripts/check_oracles.py [sf_dir] [query_name ...]
       python scripts/check_oracles.py --full [sf_dir] [...]  # full registry,
       not just the 50 driver slots
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.testing import compare_to_duckdb


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--full"]
    use_full = "--full" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    if use_full:
        queries, oracles = entrymod._full_registries()
    else:
        queries = entrymod.queries()
        oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare_to_duckdb(df, oracles[name], sf_dir)
            else:
                n = df.count()
                ok, msg = n >= 0, f"rows-only check: {n} rows"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name:35s} {dt:6.1f}s  {msg}")
        if not ok:
            failures.append(name)
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print(f"\nall {len([q for q in queries if not only or q in only])} checked queries pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
