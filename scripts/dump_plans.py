#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries into plans/r06/.

Usage: python scripts/dump_plans.py <suffix> [sf_dir] [query ...]
e.g.   python scripts/dump_plans.py before /root/testdata/sf0.1
Plan construction only — no jobs are executed (cheap, safe to run any time).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from hyrise_generalized_dedup_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]
    import bench

    names = only or bench.HEADLINE
    out_dir = "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs, _ = entrymod._full_registries()
    for name in names:
        try:
            plan = qs[name](spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                qs[name](spark, sf_dir)._jdf.queryExecution(), "formatted"
            )
        except Exception:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
