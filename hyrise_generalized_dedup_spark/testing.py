"""Cross-engine oracle comparison harness.

Mimics the driver's correctness gate: run a Spark DataFrame and the
equivalent DuckDB SQL over the same parquet tables, sort columns by name,
sort rows, and compare values. Used by pytest and by the local
`scripts/check_oracles.py` loop so oracle mismatches are caught before the
driver sees them. Modeled on the reference's verification-operator pattern
(JoinVerification as test oracle, join_verification.hpp:7-11; SQLite test
runner, sqlite_testrunner.hpp:38-41).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
from pyspark.sql import DataFrame

from .sources.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v: Any) -> Any:
    """Normalize a cell for cross-engine comparison."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows_sorted(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    projected = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(projected, key=repr)


def compare_to_duckdb(
    spark_df: DataFrame,
    oracle_sql: str,
    sf_dir: str,
    float_rel_tol: float = 0.0,
) -> tuple[bool, str]:
    """Return (match, diagnostic). float_rel_tol=0 demands bit-equality
    (what the driver's value hash effectively does)."""
    s_cols = spark_df.columns
    # Driver parity: the round driver canonicalizes through a pandas
    # reindex on column labels, which raises on duplicates. A slot with
    # duplicate output names therefore fails at the driver even though the
    # positional comparison below would tolerate it (the round-5
    # g_text_quality_langid red slot) — reject it here too.
    lowered = [c.lower() for c in s_cols]
    if len(set(lowered)) != len(lowered):
        dupes = sorted({c for c in lowered if lowered.count(c) > 1})
        return False, f"duplicate output column names (driver reindex would fail): {dupes}"
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_conn(sf_dir)
    res = con.execute(oracle_sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    a = _rows_sorted([c.lower() for c in s_cols], s_rows)
    b = _rows_sorted([c.lower() for c in d_cols], d_rows)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra == rb:
            continue
        if float_rel_tol > 0 and len(ra) == len(rb):
            ok = all(
                (
                    va == vb
                    or (
                        isinstance(va, float)
                        and isinstance(vb, float)
                        and math.isclose(va, vb, rel_tol=float_rel_tol)
                    )
                )
                for va, vb in zip(ra, rb)
            )
            if ok:
                continue
        return False, f"value mismatch at sorted row {i}:\n  spark ={ra}\n  duckdb={rb}"
    return True, f"ok ({len(s_rows)} rows)"
