"""Mechanical oracle output-type audit.

The driver's correctness gate hashes oracle values type-sensitively, while
the local harness normalizes Python ints — so a DuckDB oracle whose bare
``SUM(...)`` silently widens to HUGEINT (int128) passes every local check
and fails only on the driver.  This class cost one driver slot in each of
rounds 1 (q12_shipmode) and 2 (sessionize_events).  This test makes the
recurrence impossible: every oracle in BOTH registries (the 50 driver slots
and the full pytest registry) is bound in DuckDB and its result column
types are asserted free of the cross-engine hazard types.

DuckDB relations are lazy, so ``con.sql(sql).types`` plans the query
without executing it — the audit covers all oracles in seconds.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from hyrise_generalized_dedup_spark.testing import duckdb_conn

SF_DIR = "/root/testdata/sf0.001"

# Types DuckDB can emit that Spark never does (or represents differently
# enough that the driver's type-sensitive value hash diverges):
#   HUGEINT/UHUGEINT — int128, DuckDB's default widening for bare SUM(int).
#   DECIMAL          — oracles must CAST(... AS DOUBLE) after exact-decimal
#                      accumulation per the cross-engine convention.
#   UINTEGER et al.  — unsigned widths Spark lacks.
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")


def _all_oracles() -> dict[str, str]:
    oracles = dict(entrymod._full_registries()[1])
    oracles.update(entrymod.oracle_sql())  # merged driver-slot gates
    return oracles


@pytest.mark.parametrize("name", sorted(_all_oracles()))
def test_oracle_output_types(name: str) -> None:
    sql = _all_oracles()[name]
    con = duckdb_conn(SF_DIR)
    try:
        rel = con.sql(sql)
        bad = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if any(str(typ).upper().startswith(b) for b in BANNED)
        ]
    finally:
        con.close()
    assert not bad, (
        f"oracle '{name}' emits driver-hash-hazard column types {bad}; "
        f"CAST the offending expression (bare SUM(int) -> HUGEINT is the "
        f"usual culprit: wrap in CAST(... AS BIGINT))"
    )
