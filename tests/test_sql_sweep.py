"""Golden SQL sweep: every statement in resources/sql_sweep.sql runs
VERBATIM through spark.sql AND DuckDB over the same parquet tables, and
the results are diffed (order-insensitive, bit-exact).

This is the SQLiteTestRunner analog (reference:
src/test/lib/sql/sqlite_testrunner/sqlite_testrunner.hpp:38-41 driving
resources/test_data/sqlite_testrunner_queries.sql) — the cheapest way to
multiply cross-engine correctness coverage; grow the .sql file with every
new operator."""

from __future__ import annotations

import os

import duckdb
import pytest

from hyrise_generalized_dedup_spark.sources.tables import TABLE_NAMES, load_tables
from hyrise_generalized_dedup_spark.testing import _rows_sorted

SWEEP_FILE = os.path.join(os.path.dirname(__file__), "..", "resources", "sql_sweep.sql")


def load_sweep_statements() -> list[str]:
    raw = open(SWEEP_FILE).read()
    lines = [ln for ln in raw.splitlines() if not ln.lstrip().startswith("--")]
    statements = [s.strip() for s in "\n".join(lines).split(";")]
    return [s for s in statements if s]


STATEMENTS = load_sweep_statements()


def test_sweep_is_substantial():
    assert len(STATEMENTS) >= 100, f"sweep shrank to {len(STATEMENTS)} statements"


@pytest.fixture(scope="module")
def engines(spark, sf_tiny):
    for name, df in load_tables(spark, sf_tiny).items():
        df.createOrReplaceTempView(name)
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_tiny, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield spark, con
    con.close()


@pytest.mark.parametrize("idx", range(len(STATEMENTS)), ids=lambda i: f"stmt{i:03d}")
def test_sweep_statement(engines, idx):
    spark, con = engines
    stmt = STATEMENTS[idx]
    sdf = spark.sql(stmt)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(stmt)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"schema: {s_cols} vs {d_cols}\n{stmt}"
    assert len(s_rows) == len(d_rows), f"rows: {len(s_rows)} vs {len(d_rows)}\n{stmt}"
    a = _rows_sorted(s_cols, s_rows)
    b = _rows_sorted(d_cols, d_rows)
    for i, (ra, rb) in enumerate(zip(a, b)):
        assert ra == rb, f"row {i}: spark={ra} duckdb={rb}\n{stmt}"
