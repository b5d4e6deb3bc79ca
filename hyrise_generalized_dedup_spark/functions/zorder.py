"""Z-order (Morton) multi-dimensional layout — data-skipping writes.

At 100 TB a table laid out by ONE column prunes scans on that column
only; a training corpus is sliced along several axes at once (length x
id range, repo bucket x size, time x lang). Z-ordering interleaves the
bits of several quantized columns into one Morton key and range-
partitions the write on it, so EVERY interleaved dimension gets tight
per-file min/max parquet stats — the layout trick behind Delta Lake's
``OPTIMIZE ZORDER BY`` and the Apache Iceberg sort-order spec (public
docs/papers: Morton 1966; both engines' public documentation).

Reference analog: the reference orders chunks for locality inside its
storage layer (`src/lib/storage/chunk.hpp`,
`src/lib/operators/sort.cpp`) but is single-dimensional; the Morton
layout is the distributed generalization that keeps multi-predicate
scans prunable after an Iceberg-style write.

Everything is exact integer arithmetic (shiftleft / & / + — JVM
whole-stage codegen on the Spark side), and every expression is built
by ONE generator with a ``dialect`` switch, so the DuckDB oracle
recomputes identical Morton keys bit-for-bit:

- quantize: ``((x - lo) * (2^bits - 1)) div (hi - lo)`` — integer
  min-max scale into ``bits``-bit space (``div`` in Spark, ``//`` in
  DuckDB; no doubles anywhere, so no half-even-vs-truncate hazards);
- interleave: bit ``i`` of dimension ``j`` lands at position
  ``i * n_dims + j``; disjoint positions, so the OR is a ``+``.

Scale shape: the only non-map work is the 1-row global min/max
aggregate (map-side partial, broadcast back — no driver collect) and
the final range exchange; the Morton key itself is map-only column
math. ``repartitionByRange`` samples the key (one extra pass) exactly
as any sorted write would.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BITS = 16  # per-dimension quantization width
_DIALECTS = ("spark", "duckdb")


def quantize_sql(x: str, lo: str, hi: str, *, dialect: str, bits: int = BITS) -> str:
    """Integer min-max quantization of expression ``x`` into [0, 2^bits)
    given bound expressions ``lo``/``hi`` — same value in both engines."""
    assert dialect in _DIALECTS, dialect
    maxq = (1 << bits) - 1
    div = "div" if dialect == "spark" else "//"
    span = f"(CASE WHEN {hi} > {lo} THEN {hi} - {lo} ELSE 1 END)"
    return f"(((CAST({x} AS BIGINT) - {lo}) * {maxq}) {div} {span})"


def zvalue_sql(qcols: list[str], *, dialect: str, bits: int = BITS) -> str:
    """Morton interleave of pre-quantized columns: bit ``i`` of dim ``j``
    goes to position ``i * len(qcols) + j``. Positions are disjoint, so
    the combine is ``+`` (identical in both dialects)."""
    assert dialect in _DIALECTS, dialect
    d = len(qcols)
    terms = []
    for j, q in enumerate(qcols):
        for i in range(bits):
            pos = i * d + j
            if dialect == "spark":
                bit = f"(shiftright({q}, {i}) & 1)" if i else f"({q} & 1)"
                terms.append(f"shiftleft({bit}, {pos})" if pos else bit)
            else:
                bit = f"(({q} >> {i}) & 1)" if i else f"({q} & 1)"
                terms.append(f"({bit} << {pos})" if pos else bit)
    return "(" + " + ".join(terms) + ")"


def with_zkey(df: DataFrame, cols: list[str], bits: int = BITS) -> DataFrame:
    """``df`` plus ``q_0..q_{d-1}`` (quantized dims, in ``cols`` order)
    and ``zkey`` (the Morton key). Bounds come from a 1-row min/max
    aggregate broadcast back onto the plan — no driver collect, and the
    aggregate is map-side partial so it is one cheap extra pass."""
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(F.col(c).cast("long")).alias(f"__lo_{i}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"__hi_{i}"))
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    qnames = []
    for i, c in enumerate(cols):
        q = f"q_{i}"
        out = out.withColumn(
            q, F.expr(quantize_sql(c, f"__lo_{i}", f"__hi_{i}", dialect="spark", bits=bits))
        )
        qnames.append(q)
    out = out.withColumn("zkey", F.expr(zvalue_sql(qnames, dialect="spark", bits=bits)))
    return out.drop(*[f"__lo_{i}" for i in range(len(cols))],
                    *[f"__hi_{i}" for i in range(len(cols))])


def zorder_layout(df: DataFrame, cols: list[str], n_partitions: int,
                  bits: int = BITS) -> DataFrame:
    """Range-partition + sort ``df`` by the Morton key of ``cols`` so a
    parquet write of the result yields per-file min/max stats that are
    tight on EVERY listed dimension (multi-column data skipping). The
    helper columns are dropped; callers write the result as-is."""
    keyed = with_zkey(df, cols, bits=bits)
    laid = keyed.repartitionByRange(n_partitions, "zkey").sortWithinPartitions("zkey")
    return laid.drop("zkey", *[f"q_{i}" for i in range(len(cols))])


def _bucket_shift(n_dims: int, n_buckets: int, bits: int) -> int:
    lb = int(math.log2(n_buckets))
    if (1 << lb) != n_buckets:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    return n_dims * bits - lb


def zorder_census(df: DataFrame, cols: list[str], n_buckets: int = 64,
                  bits: int = BITS) -> DataFrame:
    """Clustering-quality census: cut the Morton range into ``n_buckets``
    equal slabs (the file boundaries a z-ordered write would produce)
    and report each slab's per-dimension quantized bounding box plus its
    volume (``bbox_area``). Tight boxes == prunable files; the layout
    quality metric Delta's OPTIMIZE docs describe, computed exactly.

    One exchange (the groupBy on bucket, map-side partial) after the
    map-only key math."""
    keyed = with_zkey(df, cols, bits=bits)
    shift = _bucket_shift(len(cols), n_buckets, bits)
    g = keyed.groupBy(F.shiftright("zkey", shift).alias("bucket"))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    area = F.lit(1).cast("long")
    sides = []
    for i in range(len(cols)):
        aggs.append(F.min(f"q_{i}").alias(f"min_q{i}"))
        aggs.append(F.max(f"q_{i}").alias(f"max_q{i}"))
        sides.append(f"q{i}")
    out = g.agg(*aggs)
    for s in sides:
        area = area * (F.col(f"max_{s}") - F.col(f"min_{s}") + F.lit(1))
    return out.withColumn("bbox_area", area.cast("long"))


def zorder_census_oracle_sql(pts_sql: str, n_dims: int = 2, n_buckets: int = 64,
                             bits: int = BITS) -> str:
    """DuckDB statement recomputing :func:`zorder_census` bit-for-bit.
    ``pts_sql`` must yield columns ``x0..x{d-1}`` (the raw dims)."""
    shift = _bucket_shift(n_dims, n_buckets, bits)
    qexprs = ", ".join(
        quantize_sql(f"x{i}", f"lo_{i}", f"hi_{i}", dialect="duckdb", bits=bits)
        + f" AS q_{i}"
        for i in range(n_dims)
    )
    bexprs = ", ".join(
        f"MIN(CAST(x{i} AS BIGINT)) AS lo_{i}, MAX(CAST(x{i} AS BIGINT)) AS hi_{i}"
        for i in range(n_dims)
    )
    z = zvalue_sql([f"q_{i}" for i in range(n_dims)], dialect="duckdb", bits=bits)
    mins = ", ".join(
        f"CAST(MIN(q_{i}) AS BIGINT) AS min_q{i}, CAST(MAX(q_{i}) AS BIGINT) AS max_q{i}"
        for i in range(n_dims)
    )
    area = " * ".join(f"(MAX(q_{i}) - MIN(q_{i}) + 1)" for i in range(n_dims))
    return f"""
    WITH pts AS ({pts_sql}),
    b AS (SELECT {bexprs} FROM pts),
    q AS (SELECT {qexprs} FROM pts CROSS JOIN b),
    z AS (SELECT {z} AS zkey, * FROM q)
    SELECT CAST(zkey >> {shift} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {mins},
           CAST({area} AS BIGINT) AS bbox_area
    FROM z GROUP BY bucket
    """
