"""Z-order layout (functions/zorder.py): Morton-key exactness vs a pure
Python oracle, degenerate bounds, multi-column pruning quality vs a
single-column sort, the range-exchange plan shape, and per-file parquet
stats through the real `zorder_layout` write path.

The census itself is DuckDB-diffed via the full-registry parametrization
(tests/test_relational.py, `code_zorder_census`) and rides the
g_dedup_censuses driver gate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hyrise_generalized_dedup_spark.functions.zorder import (
    BITS,
    with_zkey,
    zorder_census,
    zorder_layout,
)

MAXQ = (1 << BITS) - 1


def _quant(x: int, lo: int, hi: int) -> int:
    return ((x - lo) * MAXQ) // max(hi - lo, 1)


def _morton(qs: list[int], bits: int = BITS) -> int:
    z = 0
    for j, q in enumerate(qs):
        for i in range(bits):
            z |= ((q >> i) & 1) << (i * len(qs) + j)
    return z


def _grid(spark, n: int = 64):
    """n x n integer grid: x0 = col, x1 = row."""
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x0"), (F.col("id") / n).cast("long").alias("x1")
    )


def test_morton_key_matches_python_oracle(spark):
    pts = [(3, 1), (0, 0), (17, 255), (255, 17), (128, 128), (254, 1), (1, 254)]
    df = spark.createDataFrame(pts, "x0 long, x1 long")
    rows = with_zkey(df, ["x0", "x1"]).collect()
    lo0, hi0 = 0, 255
    lo1, hi1 = 0, 255
    for r in rows:
        q0, q1 = _quant(r.x0, lo0, hi0), _quant(r.x1, lo1, hi1)
        assert (r.q_0, r.q_1) == (q0, q1), (r.x0, r.x1)
        assert r.zkey == _morton([q0, q1]), (r.x0, r.x1)


def test_three_dims_and_negative_bounds(spark):
    """d=3 interleave (positions i*3+j) and a negative lo both stay exact."""
    pts = [(-5, 2, 9), (5, 0, 0), (0, 7, 3), (-1, 3, 9)]
    df = spark.createDataFrame(pts, "a long, b long, c long")
    rows = with_zkey(df, ["a", "b", "c"]).collect()
    bounds = {"a": (-5, 5), "b": (0, 7), "c": (0, 9)}
    for r in rows:
        qs = [_quant(r.a, *bounds["a"]), _quant(r.b, *bounds["b"]),
              _quant(r.c, *bounds["c"])]
        assert [r.q_0, r.q_1, r.q_2] == qs
        assert r.zkey == _morton(qs)


def test_constant_dimension_quantizes_to_zero(spark):
    df = spark.createDataFrame([(7, 1), (7, 2), (7, 3)], "x0 long, x1 long")
    rows = with_zkey(df, ["x0", "x1"]).collect()
    assert all(r.q_0 == 0 for r in rows)  # hi == lo -> span clamp, all zero
    assert {r.q_1 for r in rows} == {0, MAXQ // 2, MAXQ}


def test_census_rejects_non_power_of_two_buckets(spark):
    df = spark.createDataFrame([(1, 2)], "x0 long, x1 long")
    with pytest.raises(ValueError):
        zorder_census(df, ["x0", "x1"], n_buckets=60)


def test_zorder_buckets_bound_every_dimension(spark):
    """On a uniform 64x64 grid, 64 z-slabs are ~8x8 quantized squares: the
    per-bucket extent of EACH dimension is a small fraction of the full
    range. The same 64 buckets cut on x0 alone leave x1 unbounded (full
    range in every bucket) — the single-column layout's pruning failure."""
    grid = _grid(spark)
    z = zorder_census(grid, ["x0", "x1"], n_buckets=64).collect()
    assert sum(r.n_docs for r in z) == 64 * 64
    # every z-bucket's bounding box is tight on BOTH dims (<= 1/4 range)
    for r in z:
        assert r.max_q0 - r.min_q0 <= MAXQ // 4, r
        assert r.max_q1 - r.min_q1 <= MAXQ // 4, r

    # comparator: 64 equal slabs over q_0 only — x1 spans the full range
    keyed = with_zkey(grid, ["x0", "x1"])
    lin = (
        keyed.groupBy(F.shiftright("q_0", BITS - 6).alias("bucket"))
        .agg(F.min("q_1").alias("min_q1"), F.max("q_1").alias("max_q1"))
        .collect()
    )
    assert all(r.max_q1 - r.min_q1 == MAXQ for r in lin)


def test_layout_plan_is_one_range_exchange(spark):
    laid = zorder_layout(_grid(spark), ["x0", "x1"], n_partitions=16)
    plan = laid._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan
    assert "cartesianproduct" not in plan  # bounds join must be broadcast
    assert plan.count("rangepartitioning") == 1


def test_written_file_stats_prune_the_secondary_dimension(spark, tmp_path):
    """The end-to-end claim: a parquet write laid out by zorder_layout
    yields per-file min/max on the NON-leading dimension tight enough to
    skip most files for a slab predicate, where a leading-column range
    layout skips none. (File stats read back via input_file_name; the
    same bounds a parquet footer-stats pruner would use.)"""
    grid = _grid(spark)
    zdir, xdir = str(tmp_path / "z"), str(tmp_path / "x")
    zorder_layout(grid, ["x0", "x1"], n_partitions=16).write.parquet(zdir)
    grid.repartitionByRange(16, "x0").write.parquet(xdir)

    def file_bounds(path):
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("x1").alias("lo"), F.max("x1").alias("hi"))
            .collect()
        )

    zb, xb = file_bounds(zdir), file_bounds(xdir)
    assert len(zb) == 16 and len(xb) == 16
    # slab predicate: x1 < 8 (bottom 1/8 of the grid)
    z_hit = sum(1 for r in zb if r.lo < 8)
    x_hit = sum(1 for r in xb if r.lo < 8)
    assert x_hit == 16  # leading-column layout: every file intersects
    assert z_hit <= 8  # Morton layout: at most half, typically 1/4
    # and the layout preserved every row
    assert spark.read.parquet(zdir).count() == 64 * 64
