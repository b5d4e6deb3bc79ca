#!/usr/bin/env python
"""Validate candidate SQL-sweep statements against Spark AND DuckDB at
sf0.001 BEFORE appending them to resources/sql_sweep.sql — the pre-merge
protocol from the round-workflow notes (dialect gaps and value-typing
hazards surface here, not in CI).

Also flags candidates that duplicate an existing sweep statement
(whitespace-normalized).

Usage: python scripts/validate_sweep_candidates.py <candidates.sql>
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from hyrise_generalized_dedup_spark.session import get_spark
from hyrise_generalized_dedup_spark.sources.tables import TABLE_NAMES, load_tables
from hyrise_generalized_dedup_spark.testing import _rows_sorted

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.001")
SWEEP_FILE = "/root/repo/resources/sql_sweep.sql"


def parse_statements(path: str) -> list[str]:
    raw = open(path).read()
    lines = [ln for ln in raw.splitlines() if not ln.lstrip().startswith("--")]
    return [s.strip() for s in "\n".join(lines).split(";") if s.strip()]


def norm(stmt: str) -> str:
    return re.sub(r"\s+", " ", stmt).strip().lower()


def main() -> int:
    cands = parse_statements(sys.argv[1])
    existing = {norm(s) for s in parse_statements(SWEEP_FILE)}
    dupes = [s for s in cands if norm(s) in existing]
    seen: set[str] = set()
    internal_dupes = []
    for s in cands:
        if norm(s) in seen:
            internal_dupes.append(s)
        seen.add(norm(s))

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    for name, df in load_tables(spark, SF_DIR).items():
        df.createOrReplaceTempView(name)
    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for i, stmt in enumerate(cands):
        tag = f"cand{i:03d}"
        try:
            sdf = spark.sql(stmt)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(stmt)
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((tag, stmt, f"EXEC {type(e).__name__}: {e}"))
            print(f"[FAIL-EXEC] {tag}: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((tag, stmt, f"schema {s_cols} vs {d_cols}"))
            print(f"[FAIL-SCHEMA] {tag}: {s_cols} vs {d_cols}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append((tag, stmt, f"rows {len(s_rows)} vs {len(d_rows)}"))
            print(f"[FAIL-ROWS] {tag}: {len(s_rows)} vs {len(d_rows)}")
            continue
        a = _rows_sorted(s_cols, s_rows)
        b = _rows_sorted(d_cols, d_rows)
        bad = next((k for k, (ra, rb) in enumerate(zip(a, b)) if ra != rb), None)
        if bad is not None:
            failures.append((tag, stmt, f"value row {bad}: {a[bad]} vs {b[bad]}"))
            print(f"[FAIL-VALUE] {tag}: row {bad}\n  spark ={a[bad]}\n  duckdb={b[bad]}")
        else:
            print(f"[PASS] {tag} ({len(s_rows)} rows)")
    spark.stop()
    con.close()

    print(f"\n{len(cands)} candidates: {len(cands) - len(failures)} pass, {len(failures)} fail")
    if dupes:
        print(f"{len(dupes)} DUPLICATE existing sweep statements:")
        for s in dupes:
            print("  DUP:", norm(s)[:120])
    if internal_dupes:
        print(f"{len(internal_dupes)} internal duplicates")
    return 1 if failures or dupes or internal_dupes else 0


if __name__ == "__main__":
    sys.exit(main())
