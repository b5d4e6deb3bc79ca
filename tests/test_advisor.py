"""Encoding advisor (sources/advisor.py).

The oracle is the binary writer itself: every formula-predicted size is
compared to len() of the bytes the real encoder emits for the same
chunk, across types, null patterns, and degenerate shapes.
"""

from __future__ import annotations

import random

import pytest

from hyrise_generalized_dedup_spark.sources import advisor as A
from hyrise_generalized_dedup_spark.sources import binary as B

_ENC_FN = {
    "Unencoded": lambda v, t, nullable: B._encode_unencoded_segment(v, t, nullable),
    "Dictionary": lambda v, t, nullable: B._encode_dictionary_segment(v, t, "fixed"),
    "RunLength": lambda v, t, nullable: B._encode_runlength_segment(v, t),
    "FixedStringDictionary": lambda v, t, nullable: B._encode_dictionary_segment(
        v, t, "fixed", fixed_string=True
    ),
    "FrameOfReference": lambda v, t, nullable: B._encode_for_segment(v, t, "fixed"),
}


def _assert_formulas_match_writer(spark, rows, cols, chunk, nullable=None):
    nullable = nullable or {c: True for c in cols}
    schema = ", ".join(
        f"{c} {'bigint' if t == 'long' else t}" for c, t in
        [("rid", "long")] + [(c, t) for c, t in cols.items()]
    )
    df = spark.createDataFrame(rows, schema)
    adv = A.advise_encodings(df, "rid", chunk, cols, nullable).toPandas()
    bychunk: dict[int, list] = {}
    for r in rows:
        bychunk.setdefault(r[0] // chunk, []).append(r)
    names = list(cols)
    mismatches = []
    for row in adv.itertuples(index=False):
        vals = [t[1 + names.index(row.column_name)] for t in bychunk[row.chunk_id]]
        actual = len(
            _ENC_FN[row.encoding](vals, cols[row.column_name], nullable[row.column_name])
        )
        if actual != row.size_in_bytes:
            mismatches.append((row.chunk_id, row.column_name, row.encoding,
                               row.size_in_bytes, actual))
    assert not mismatches, mismatches
    # chosen == argmin with deterministic tie break
    for (ck, cn), sub in adv.groupby(["chunk_id", "column_name"]):
        chosen = sub[sub.chosen]
        assert len(chosen) == 1
        assert chosen.size_in_bytes.iloc[0] == sub.size_in_bytes.min()
    return adv


def test_formulas_byte_exact_random_mixed(spark):
    rnd = random.Random(11)
    rows = []
    for i in range(900):
        s = None if rnd.random() < 0.2 else rnd.choice(
            ["x", "yy", "zzz", f"w{rnd.randint(0, 30)}"]
        )
        vi = None if rnd.random() < 0.1 else rnd.randint(-5, 70000)
        vl = None if rnd.random() < 0.05 else rnd.randint(0, 2**40)
        d = None if rnd.random() < 0.08 else rnd.randint(0, 9) / 4
        rows.append((i, s, vi, vl, d))
    cols = {"s": "string", "vi": "int", "vl": "long", "d": "double"}
    adv = _assert_formulas_match_writer(spark, rows, cols, 256)
    # every applicable encoding is present per column
    per_col = adv.groupby("column_name")["encoding"].unique()
    assert set(per_col["s"]) == {
        "Unencoded", "Dictionary", "RunLength", "FixedStringDictionary",
    }
    assert set(per_col["vi"]) == {
        "Unencoded", "Dictionary", "RunLength", "FrameOfReference",
    }
    assert set(per_col["vl"]) == {"Unencoded", "Dictionary", "RunLength"}


def test_formulas_byte_exact_degenerate_shapes(spark):
    """Constant columns, all-null chunks, single-row chunks, empty strings."""
    rows = []
    for i in range(60):
        s = "" if i % 3 == 0 else ("const" if i < 40 else None)
        vi = 7 if i < 30 else None
        rows.append((i, s, vi))
    _assert_formulas_match_writer(
        spark, rows, {"s": "string", "vi": "int"}, 16
    )
    # single-row chunks
    _assert_formulas_match_writer(
        spark, [(i * 5, f"s{i}", i) for i in range(8)],
        {"s": "string", "vi": "int"}, 5,
    )


def test_formulas_byte_exact_non_nullable(spark):
    rows = [(i, i % 4, f"k{i % 3}") for i in range(100)]
    _assert_formulas_match_writer(
        spark, rows, {"vi": "int", "s": "string"}, 32,
        nullable={"vi": False, "s": False},
    )


def test_for_width_tracks_block_range(spark):
    """FrameOfReference width is driven by the per-block value RANGE, not
    the absolute values — a huge-valued but narrow-range column stays at
    width 1."""
    rows = [(i, 10_000_000 + (i % 7)) for i in range(300)]
    adv = _assert_formulas_match_writer(spark, rows, {"vi": "int"}, 300)
    f = adv[adv.encoding == "FrameOfReference"].iloc[0]
    # 11 fixed + 1 byte/value * 300
    assert f.size_in_bytes == 11 + 300
    assert bool(f.chosen)


def test_multi_block_for_chunks(spark):
    """Chunks larger than the 2048-value FoR block: per-block minima."""
    rows = [(i, (i % 2048) + (10**6 if i >= 2048 else 0)) for i in range(4096)]
    _assert_formulas_match_writer(spark, rows, {"vi": "int"}, 4096)


def test_runlength_wins_on_sorted_runs(spark):
    rows = [(i, i // 50) for i in range(500)]
    adv = _assert_formulas_match_writer(spark, rows, {"vi": "int"}, 500)
    chosen = adv[adv.chosen].iloc[0]
    assert chosen.encoding == "RunLength"


def test_null_run_merge_semantics(spark):
    """NULL runs merge regardless of surrounding values (run_length_
    encoder.hpp:27-57) — formula and writer agree on crafted flips."""
    vals = [1, None, None, 1, 1, None, 2, 2, None, None, None, 3]
    rows = [(i, v) for i, v in enumerate(vals)]
    adv = _assert_formulas_match_writer(spark, rows, {"vi": "int"}, len(vals))
    rl = adv[adv.encoding == "RunLength"].iloc[0]
    # runs: 1 | null | 1 | null | 2 | null | 3 = 7
    assert rl.size_in_bytes == 5 + 4 * 7 + 7 + 4 * 7


def test_stats_surface(spark):
    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else f"v{i % 3}") for i in range(40)],
        "rid bigint, s string",
    )
    stats = A.chunk_column_stats(df, "rid", 20, {"s": "string"}).orderBy("chunk_id")
    rows = stats.collect()
    assert [r["n"] for r in rows] == [20, 20]
    assert rows[0]["s_nulls"] == 5 and rows[0]["s_distinct"] == 3
    assert rows[0]["s_bytes_distinct"] == 6 and rows[0]["s_maxlen"] == 2


def test_advisor_plan_has_no_python_stage(spark):
    """The advisor is pure Column expressions — no BatchEvalPython /
    ArrowEvalPython / mapInPandas anywhere in the plan."""
    df = spark.range(1000).selectExpr(
        "id AS rid", "CAST(id % 7 AS INT) AS vi", "CAST(id % 3 AS STRING) AS s"
    )
    adv = A.advise_encodings(df, "rid", 256, {"vi": "int", "s": "string"})
    plan = adv._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "mapInPandas" not in plan
