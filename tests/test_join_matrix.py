"""Exhaustive join-configuration matrix vs DuckDB.

The reference crosses {join modes x predicates x table types x encodings}
against a naive JoinVerification oracle (join_test_runner.cpp:153-190,
join_verification.hpp:7-11). Spark analog: every join mode the engine maps
(operators/core.py JOIN_MODE — reference modes at src/lib/types.hpp:207-212)
crossed with {unique keys, dup+null keys, empty} on BOTH sides, each case
diffed against DuckDB running the equivalent SQL over the same rows.
"""

from __future__ import annotations

import duckdb
import pytest

from hyrise_generalized_dedup_spark.testing import _rows_sorted

# (variant name, rows) — rows are (key, payload)
LEFT_VARIANTS = {
    "unique": [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
    "messy": [(1, "a"), (1, "a2"), (2, "b"), (None, "n1"), (None, "n2"), (5, "e")],
    "empty": [],
}
RIGHT_VARIANTS = {
    "unique": [(2, "X"), (3, "Y"), (6, "Z")],
    "messy": [(2, "X"), (2, "X2"), (None, "N"), (7, "W"), (3, "Y")],
    "empty": [],
}

MODES = ["inner", "left", "right", "full_outer", "cross", "left_semi", "left_anti", "not_in"]

_DUCK_JOIN = {
    "inner": "SELECT l.lk, l.lv, r.rk, r.rv FROM l JOIN r ON l.lk = r.rk",
    "left": "SELECT l.lk, l.lv, r.rk, r.rv FROM l LEFT JOIN r ON l.lk = r.rk",
    "right": "SELECT l.lk, l.lv, r.rk, r.rv FROM l RIGHT JOIN r ON l.lk = r.rk",
    "full_outer": "SELECT l.lk, l.lv, r.rk, r.rv FROM l FULL OUTER JOIN r ON l.lk = r.rk",
    "cross": "SELECT l.lk, l.lv, r.rk, r.rv FROM l CROSS JOIN r",
    "left_semi": "SELECT l.lk, l.lv FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.rk = l.lk)",
    "left_anti": "SELECT l.lk, l.lv FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.rk = l.lk)",
    # null-aware anti (reference AntiNullAsTrue): NOT IN semantics
    "not_in": "SELECT l.lk, l.lv FROM l WHERE l.lk NOT IN (SELECT r.rk FROM r)",
}


def _values_sql(rows, cols):
    if not rows:
        return (
            f"SELECT CAST(NULL AS INTEGER) AS {cols[0]}, CAST(NULL AS STRING) AS {cols[1]} "
            "WHERE FALSE"
        )
    vals = ", ".join(
        f"({'NULL' if k is None else k}, '{v}')" for k, v in rows
    )
    return f"SELECT * FROM (VALUES {vals}) t({cols[0]}, {cols[1]})"


@pytest.fixture(scope="module")
def matrix_frames(spark):
    frames = {}
    for side, variants, cols in (
        ("l", LEFT_VARIANTS, ("lk", "lv")),
        ("r", RIGHT_VARIANTS, ("rk", "rv")),
    ):
        for vname, rows in variants.items():
            frames[(side, vname)] = spark.createDataFrame(
                rows, f"{cols[0]} int, {cols[1]} string"
            )
    return frames


@pytest.mark.parametrize("lvar", sorted(LEFT_VARIANTS))
@pytest.mark.parametrize("rvar", sorted(RIGHT_VARIANTS))
@pytest.mark.parametrize("mode", MODES)
def test_join_mode_matches_duckdb(spark, matrix_frames, mode, lvar, rvar):
    l = matrix_frames[("l", lvar)]
    r = matrix_frames[("r", rvar)]

    if mode == "cross":
        sdf = l.crossJoin(r)
    elif mode == "not_in":
        l.createOrReplaceTempView("l")
        r.createOrReplaceTempView("r")
        sdf = spark.sql(_DUCK_JOIN["not_in"])
    elif mode in ("left_semi", "left_anti"):
        sdf = l.join(r, l.lk == r.rk, mode)
    else:
        sdf = l.join(r, l.lk == r.rk, mode)

    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(x) for x in sdf.collect()]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW l AS {_values_sql(LEFT_VARIANTS[lvar], ('lk', 'lv'))}")
    con.execute(f"CREATE VIEW r AS {_values_sql(RIGHT_VARIANTS[rvar], ('rk', 'rv'))}")
    res = con.execute(_DUCK_JOIN[mode])
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{mode}/{lvar}/{rvar}: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{mode}/{lvar}/{rvar}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    assert _rows_sorted(s_cols, s_rows) == _rows_sorted(d_cols, d_rows), (
        f"{mode}/{lvar}/{rvar}: value mismatch"
    )
