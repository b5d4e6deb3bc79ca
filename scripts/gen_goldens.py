#!/usr/bin/env python
"""Regenerate the committed golden parquets for driver slots whose
semantics are not SQL-expressible (winnowing fingerprints, LSH sketch
bucket censuses).

The kernels themselves are verified against brute-force/property oracles
in pytest (tests/test_functions.py, tests/test_ann.py); the goldens turn
the driver slots from rows-only checks into VALUE checks: the oracle is
``SELECT ... FROM read_parquet('<golden>')`` and any change in kernel
output hash-mismatches. Deterministic: seeded hyperplanes, deterministic
fingerprint kernel, rows sorted, Arrow-exact dtypes, fixed input
(/root/testdata/sf0.01 — the scale the driver's correctness gate runs).

Usage: python scripts/gen_goldens.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import pyarrow.parquet as pq

from hyrise_generalized_dedup_spark.goldens import GOLDENS


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/resources/goldens"
    os.makedirs(out_dir, exist_ok=True)

    from hyrise_generalized_dedup_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    for name, (modpath, qreg, sort_cols) in GOLDENS.items():
        mod = __import__(modpath, fromlist=[qreg])
        df = getattr(mod, qreg)[name](spark, sf_dir).orderBy(*sort_cols)
        at = df.toArrow()  # exact Spark output dtypes, no pandas coercion
        out = os.path.join(out_dir, f"{name}.sf0_01.parquet")
        pq.write_table(at, out, compression="zstd")
        print(f"wrote {out}: {at.num_rows} rows, schema {at.schema}")
    spark.stop()


if __name__ == "__main__":
    main()
