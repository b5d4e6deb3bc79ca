"""Encoding advisor — ChunkEncoder's encoding choice as a queryable plan.

The reference encodes each finalized chunk segment-by-segment with a
per-column encoding spec (reference: src/lib/storage/chunk_encoder.cpp,
ChunkEncodingSpec; the writers in binary_writer.cpp emit the result).
Picking the spec is a storage-tuning decision driven by exactly the
statistics this module computes: value count, null census, distinct
count, run count, value range, and string byte lengths.

This module turns that decision into a Spark query: for every
(chunk, column) it computes the EXACT encoded byte size each applicable
encoding of sources/binary.py would produce — closed-form integer
formulas over per-chunk statistics, verified byte-for-byte against the
real writers in tests/test_advisor.py — and marks the winner.  All the
math is JVM Column expressions (one lag window over the chunk ordering +
bounded per-chunk aggregations); nothing is re-encoded to measure, so
advising a 100 TB table costs one pass over the data, and every formula
is replayable in ANSI SQL (the driver gate's DuckDB twin replays it
LIVE).

Chunking is deterministic: ``chunk_id = floor(order_key / chunk_size)``,
the distributed analog of the reference's append-order chunks — runs
never span chunks, mirroring RunLengthSegment's per-chunk scope.

Size formulas (byte-level layout: sources/binary.py writers, which match
binary_writer.cpp; w(x) is the fixed-width attribute-vector width
1/2/4 for x <= 255 / 65535 / else — fixed_width_integer_compressor.cpp:
21-28):

  Unencoded   1 + nullable + (has_null ? n : 0) + payload(n values)
  Dictionary  1 + 1 + 4 + payload(distinct values) + w(distinct) * n
              (the NULL value id is ``distinct``, so the width is chosen
              for it even when no NULL occurs — dictionary_encoder.hpp)
  RunLength   1 + 4 + payload(runs) + runs + 4 * runs
              (a run breaks on a null-flag flip or value change; NULL
              runs merge and store the type default — run_length_
              encoder.hpp:27-57)
  FixedStringDictionary (string)
              1 + 1 + 4 + 4 + max_len * distinct + w(distinct) * n
  FrameOfReference (int32)
              1 + 1 + 4 + 4 * ceil(n / 2048) + 1 + (has_null ? n : 0)
              + w(max_block_range) * n

  payload: fixed width per type (int 4, long 8, float 4, double 8);
  strings are 8 bytes of length prefix per value + utf-8 bytes (NULL
  slots store the empty string).

Caveat: float/double run counting uses Spark's NaN-equality semantics
(NaN == NaN), while the Python writer's ``!=`` treats NaN as unequal;
the formulas are exact for NaN-free data (tests pin this).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_ITEMSIZE = {"int": 4, "long": 8, "float": 4, "double": 8}
_FOR_BLOCK = 2048
# chosen-encoding tie break: smaller size first, then this precedence
# (the order the reference lists EncodingType ids, encoding_type.hpp:26)
_PRECEDENCE = [
    "Unencoded",
    "Dictionary",
    "RunLength",
    "FixedStringDictionary",
    "FrameOfReference",
]


def _width(x):
    """Fixed-width attribute-vector byte width for max value ``x``."""
    return F.when(x <= 255, F.lit(1)).when(x <= 65535, F.lit(2)).otherwise(F.lit(4))


def chunk_column_stats(
    df: DataFrame,
    order_col: str,
    chunk_size: int,
    columns: dict[str, str],
) -> DataFrame:
    """Per-chunk per-column statistics feeding the size formulas.

    ``columns`` maps column name -> reference type string (int / long /
    float / double / string).  Returns one row per chunk with, for each
    analyzed column c: n, {c}_nulls, {c}_distinct, {c}_runs, and the
    type-specific extras ({c}_bytes, {c}_bytes_distinct, {c}_maxlen for
    strings; {c}_range for ints).  One lag window over the chunk
    ordering + one groupBy; string distincts and int block ranges add
    one bounded chunk-grain aggregation each.
    """
    chunk = (F.col(order_col) / F.lit(chunk_size)).cast("bigint").alias("chunk_id")
    w = Window.partitionBy("chunk_id").orderBy(order_col)
    base = df.select(chunk, order_col, *columns.keys())

    lagged = base
    for c in columns:
        lagged = lagged.withColumn(f"_lag_{c}", F.lag(c).over(w)).withColumn(
            f"_new_{c}",
            # first row of the chunk, a null-flag flip, or a value change
            (F.row_number().over(w) == 1)
            | (F.col(c).isNull() != F.col(f"_lag_{c}").isNull())
            | (F.col(c).isNotNull() & ~F.col(c).eqNullSafe(F.col(f"_lag_{c}"))),
        )
    if any(t == "int" for t in columns.values()):
        lagged = lagged.withColumn(
            "_blk", ((F.row_number().over(w) - 1) / F.lit(_FOR_BLOCK)).cast("bigint")
        )

    aggs = [F.count("*").alias("n")]
    for c, t in columns.items():
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}_nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}_distinct"))
        aggs.append(F.sum(F.col(f"_new_{c}").cast("bigint")).alias(f"{c}_runs"))
        if t == "string":
            aggs.append(
                F.coalesce(F.sum(F.octet_length(c)), F.lit(0)).alias(f"{c}_bytes")
            )
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(F.col(f"_new_{c}") & F.col(c).isNotNull(), F.octet_length(c))
                    ),
                    F.lit(0),
                ).alias(f"{c}_runbytes")
            )
    stats = lagged.groupBy("chunk_id").agg(*aggs)

    for c, t in columns.items():
        if t == "string":
            # distinct-value byte census: distinct (chunk, value) first so
            # repeated lengths are not collapsed nor double-counted
            dist = (
                base.select("chunk_id", c)
                .filter(F.col(c).isNotNull())
                .distinct()
                .groupBy("chunk_id")
                .agg(
                    F.sum(F.octet_length(c)).alias(f"{c}_bytes_distinct"),
                    F.max(F.octet_length(c)).alias(f"{c}_maxlen"),
                )
            )
            stats = stats.join(dist, "chunk_id", "left").fillna(
                {f"{c}_bytes_distinct": 0, f"{c}_maxlen": 0}
            )
        if t == "int":
            # FrameOfReference offset range: max over 2048-value blocks of
            # (block max - block min) over non-null values
            rng = (
                lagged.groupBy("chunk_id", "_blk")
                .agg((F.max(c) - F.min(c)).alias("_r"))
                .groupBy("chunk_id")
                .agg(F.coalesce(F.max("_r"), F.lit(0)).cast("bigint").alias(f"{c}_range"))
            )
            stats = stats.join(rng, "chunk_id", "left").fillna({f"{c}_range": 0})
    return stats


def _payload(c: str, t: str, count):
    """Encoded byte size of ``count`` values of type ``t`` (``count`` is a
    Column; string byte sums are supplied by the caller)."""
    if t == "string":
        raise AssertionError("string payloads are assembled inline")
    return count * F.lit(_ITEMSIZE[t])


def advise_encodings(
    df: DataFrame,
    order_col: str,
    chunk_size: int,
    columns: dict[str, str],
    nullable: dict[str, bool] | None = None,
) -> DataFrame:
    """-> (chunk_id, column_name, encoding, size_in_bytes, chosen): the
    exact encoded size of every applicable encoding per (chunk, column),
    with the advisor's pick flagged (min size, ties broken by the
    reference's encoding-id order)."""
    nullable = nullable or {c: True for c in columns}
    stats = chunk_column_stats(df, order_col, chunk_size, columns)

    per_col: list[DataFrame] = []
    for c, t in columns.items():
        n = F.col("n")
        nulls = F.col(f"{c}_nulls")
        has_null = (nulls > 0).cast("bigint")
        null_flag = F.lit(1 if nullable[c] else 0)
        distinct = F.col(f"{c}_distinct")
        runs = F.col(f"{c}_runs")
        sizes: dict[str, object] = {}

        if t == "string":
            values_payload = F.lit(8) * n + F.col(f"{c}_bytes")
            dict_payload = F.lit(8) * distinct + F.col(f"{c}_bytes_distinct")
            run_payload = F.lit(8) * runs + F.col(f"{c}_runbytes")
        else:
            values_payload = _payload(c, t, n)
            dict_payload = _payload(c, t, distinct)
            run_payload = _payload(c, t, runs)

        sizes["Unencoded"] = F.lit(1) + null_flag + has_null * n + values_payload
        sizes["Dictionary"] = (
            F.lit(1) + F.lit(1) + F.lit(4) + dict_payload + _width(distinct) * n
        )
        sizes["RunLength"] = F.lit(1) + F.lit(4) + run_payload + runs + F.lit(4) * runs
        if t == "string":
            sizes["FixedStringDictionary"] = (
                F.lit(1)
                + F.lit(1)
                + F.lit(4)
                + F.lit(4)
                + F.col(f"{c}_maxlen") * distinct
                + _width(distinct) * n
            )
        if t == "int":
            blocks = F.ceil(n / F.lit(_FOR_BLOCK)).cast("bigint")
            sizes["FrameOfReference"] = (
                F.lit(1)
                + F.lit(1)
                + F.lit(4)
                + F.lit(4) * blocks
                + F.lit(1)
                + has_null * n
                + _width(F.col(f"{c}_range")) * n
            )

        stack_args: list = []
        for enc, expr in sizes.items():
            stack_args.extend([F.lit(enc), expr.cast("bigint")])
        per_col.append(
            stats.select(
                "chunk_id",
                F.lit(c).alias("column_name"),
                F.stack(F.lit(len(sizes)), *stack_args).alias("encoding", "size_in_bytes"),
            )
        )

    longform = per_col[0]
    for other in per_col[1:]:
        longform = longform.unionByName(other)

    prec = F.array_position(
        F.array(*[F.lit(e) for e in _PRECEDENCE]), F.col("encoding")
    )
    w = Window.partitionBy("chunk_id", "column_name").orderBy(
        "size_in_bytes", prec.asc()
    )
    return longform.select(
        "chunk_id",
        "column_name",
        "encoding",
        "size_in_bytes",
        (F.row_number().over(w) == 1).alias("chosen"),
    )
