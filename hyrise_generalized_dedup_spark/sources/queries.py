"""Driver-checkable gates for the source readers (full registry).

`import_binary_roundtrip` exercises the reference binary table format
end-to-end inside one query: a deterministic typed fixture (all five
reference column types + NULLs + multi-chunk) is exported with
`export_binary`, re-read with `load_binary`, and returned; the DuckDB
oracle states the same rows as a VALUES literal. A hash-exact match
proves the writer and parser agree byte-level with the declared
semantics (reference: binary_parser.cpp, binary_writer.cpp).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .binary import export_binary, load_binary

_FIXTURE_ROWS = [
    ("AAAAA", 1, 100, 1.5, 11.1),
    ("BBBBBBBBBB", 2, 200, 2.25, 22.2),
    (None, 3, None, 3.75, None),
    ("DDDDDDDDDDDDDDDDDDDD", None, 400, None, 44.4),
    ("e", 5, 500, 5.5, 55.5),
]
_FIXTURE_SCHEMA = StructType(
    [
        StructField("a", StringType(), True),
        StructField("b", IntegerType(), True),
        StructField("c", LongType(), True),
        StructField("d", FloatType(), True),
        StructField("e", DoubleType(), True),
    ]
)


def q_import_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(_FIXTURE_ROWS, _FIXTURE_SCHEMA)
    path = os.path.join(tempfile.mkdtemp(prefix="gd_bin_"), "fixture.bin")
    # chunk_size=2 -> 3 chunks: the multi-chunk header/segment framing is
    # part of what the round trip must preserve; per-chunk encodings so
    # the gate drives all three encoded writers (dictionary null-id
    # vector, run merging, FoR falls back to unencoded for non-int here)
    # plus the reference's encoded-then-mutable-last-chunk shape
    export_binary(
        df,
        path,
        chunk_size=2,
        encodings=[["dictionary"] * 5, ["runlength"] * 5, ["unencoded"] * 5],
    )
    back = load_binary(spark, path)
    # float32 -> double for a stable cross-engine hash (DuckDB VALUES
    # literals are doubles); the CAST is part of the gate's contract
    return back.select(
        "a", "b", "c", F.col("d").cast("double").alias("d"), "e"
    ).orderBy("b")


_ORACLE = """
SELECT a, b, c, d, e FROM (VALUES
  ('AAAAA', 1, CAST(100 AS BIGINT), CAST(CAST(1.5 AS FLOAT) AS DOUBLE), CAST(11.1 AS DOUBLE)),
  ('BBBBBBBBBB', 2, CAST(200 AS BIGINT), CAST(CAST(2.25 AS FLOAT) AS DOUBLE), CAST(22.2 AS DOUBLE)),
  (NULL, 3, NULL, CAST(CAST(3.75 AS FLOAT) AS DOUBLE), NULL),
  ('DDDDDDDDDDDDDDDDDDDD', NULL, CAST(400 AS BIGINT), NULL, CAST(44.4 AS DOUBLE)),
  ('e', 5, CAST(500 AS BIGINT), CAST(CAST(5.5 AS FLOAT) AS DOUBLE), CAST(55.5 AS DOUBLE))
) AS t(a, b, c, d, e)
ORDER BY b
"""

def q_iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-table semantics end-to-end inside one query.

    Builds a two-snapshot table from `documents` (snapshot 1 = doc_id %
    3 != 0, snapshot 2 appends the rest), then reads it three ways —
    time travel to snapshot 1 (code 1), current (code 2), incremental
    scan of exactly the appended files (code 3) — and summarizes each
    read as (n_rows, sum of doc_id). The DuckDB oracle states the same
    three summaries straight off the parquet table, so a hash-exact
    match proves commit/manifest/hint plumbing routes precisely the
    right files to each read mode (sources/icetable.py).
    """
    from .icetable import append, create_table, incremental_scan, read_table

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    root = os.path.join(tempfile.mkdtemp(prefix="gd_ice_"), "docs_table")
    s1 = create_table(spark, root, docs.filter(F.col("doc_id") % 3 != 0))
    append(spark, root, docs.filter(F.col("doc_id") % 3 == 0))

    def summarize(df: DataFrame, code: int) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"), F.sum("doc_id").alias("sum_ids")
        ).select(F.lit(code).cast("long").alias("read_kind"), "n_rows", "sum_ids")

    return (
        summarize(read_table(spark, root, snapshot_id=s1), 1)
        .unionByName(summarize(read_table(spark, root), 2))
        .unionByName(summarize(incremental_scan(spark, root, from_snapshot_id=s1), 3))
        .orderBy("read_kind")
    )


# read codes: 1 = as-of snapshot 1, 2 = current, 3 = incremental (1, 2]
_ICE_ORACLE = """
SELECT CAST(1 AS BIGINT) AS read_kind, COUNT(*) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM documents WHERE doc_id % 3 <> 0
UNION ALL
SELECT CAST(2 AS BIGINT), COUNT(*), CAST(SUM(doc_id) AS BIGINT) FROM documents
UNION ALL
SELECT CAST(3 AS BIGINT), COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM documents WHERE doc_id % 3 = 0
ORDER BY read_kind
"""

SOURCE_QUERIES = {
    "import_binary_roundtrip": q_import_binary_roundtrip,
    "iceberg_time_travel": q_iceberg_time_travel,
}
SOURCE_ORACLES = {
    "import_binary_roundtrip": _ORACLE,
    "iceberg_time_travel": _ICE_ORACLE,
}


def q_iceberg_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot diff across an OVERWRITE commit.

    Snapshot 1 holds doc_id % 3 != 0; snapshot 2 overwrites with
    doc_id % 5 != 0, upper-casing text where doc_id % 7 == 0 — so every
    change kind (added / removed / modified / unchanged) is planted with
    a closed-form membership rule the DuckDB oracle restates directly.
    Summarizes the diff as (change_kind, n_rows, sum_ids); codes
    1=added 2=removed 3=modified 4=unchanged."""
    from .icetable import create_table, overwrite, snapshot_diff

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    root = os.path.join(tempfile.mkdtemp(prefix="gd_icediff_"), "docs_table")
    s1 = create_table(spark, root, docs.filter(F.col("doc_id") % 3 != 0))
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.upper("text")).otherwise(
            F.col("text")
        ),
    )
    overwrite(spark, root, new)
    diff = snapshot_diff(spark, root, from_snapshot_id=s1)
    code = (
        F.when(F.col("change") == "added", 1)
        .when(F.col("change") == "removed", 2)
        .when(F.col("change") == "modified", 3)
        .otherwise(4)
        .cast("long")
    )
    return (
        diff.groupBy(code.alias("change_kind"))
        .agg(F.count("*").alias("n_rows"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("change_kind")
    )


# membership rules: added = in new only (%3=0, %5<>0); removed = in old
# only (%3<>0, %5=0); modified = both sides with %7=0 text flip AND a
# non-empty text to flip (upper('') = ''); unchanged = the rest of both
_ICE_DIFF_ORACLE = """
SELECT CAST(1 AS BIGINT) AS change_kind, COUNT(*) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM documents WHERE doc_id % 3 = 0 AND doc_id % 5 <> 0
UNION ALL
SELECT CAST(2 AS BIGINT), COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0
UNION ALL
SELECT CAST(3 AS BIGINT), COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM documents
WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0 AND doc_id % 7 = 0
  AND upper(text) <> text
UNION ALL
SELECT CAST(4 AS BIGINT), COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM documents
WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0
  AND NOT (doc_id % 7 = 0 AND upper(text) <> text)
ORDER BY change_kind
"""

SOURCE_QUERIES["iceberg_snapshot_diff"] = q_iceberg_snapshot_diff
SOURCE_ORACLES["iceberg_snapshot_diff"] = _ICE_DIFF_ORACLE


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source/sink round trip (sources/jsonl.py): write `documents`
    as JSON-lines, read it back with the explicit schema, and summarize
    per language — the DuckDB oracle states the same summary straight off
    the parquet table, so a hash-exact match proves the encode/decode
    loses nothing (row count, ids, char counts, lang strings)."""
    from .jsonl import load_jsonl, write_jsonl

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    path = os.path.join(tempfile.mkdtemp(prefix="gd_jsonl_"), "docs.jsonl")
    write_jsonl(docs, path)
    back = load_jsonl(
        spark,
        path,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("sum_ids"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.length("text")).cast("long").alias("sum_text_len"),
        )
        .orderBy("lang")
    )


_JSONL_ORACLE = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
FROM documents GROUP BY lang ORDER BY lang
"""

SOURCE_QUERIES["jsonl_roundtrip"] = q_jsonl_roundtrip
SOURCE_ORACLES["jsonl_roundtrip"] = _JSONL_ORACLE


def q_iceberg_pruned_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-pruned reads end-to-end inside one query.

    Builds a stat+bloom snapshot table from `documents` (8 key-ranged
    files; per-file min/max on doc_id/n_chars, Bloom filters on the
    content sha), then reads it three ways — manifest-pruned range scan
    on n_chars (code 1), Bloom point-lookup of doc 7's content sha
    (code 2), and a compound range scan on both stat dims (code 3) —
    summarizing each as (n_rows, sum of doc_id). The DuckDB oracle
    states the same summaries as plain filters over the parquet table,
    so a hash-exact match proves the driver-side file pruning loses no
    rows and the residual filters restore exact semantics
    (sources/icetable.py scan_table / point_lookup).
    """
    from .icetable import create_table, point_lookup, scan_table

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    keyed = docs.select(
        "doc_id", "n_chars", F.sha2(F.col("text"), 256).alias("sha")
    )
    root = os.path.join(tempfile.mkdtemp(prefix="gd_icepr_"), "docs_table")
    create_table(
        spark, root, keyed.repartitionByRange(8, "doc_id"),
        stat_cols=["doc_id", "n_chars"], bloom_cols=["sha"],
    )
    target_sha = keyed.filter(F.col("doc_id") == 7).collect()[0].sha

    def summarize(df: DataFrame, code: int) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"), F.sum("doc_id").alias("sum_ids")
        ).select(F.lit(code).cast("long").alias("read_kind"), "n_rows", "sum_ids")

    return (
        summarize(scan_table(spark, root, {"n_chars": (100, 500)}), 1)
        .unionByName(summarize(point_lookup(spark, root, "sha", target_sha), 2))
        .unionByName(summarize(
            scan_table(spark, root, {"doc_id": (50, 199), "n_chars": (None, 800)}), 3
        ))
        .orderBy("read_kind")
    )


# read codes: 1 = range scan on n_chars, 2 = bloom point-lookup by sha,
# 3 = compound range scan (doc_id x n_chars, half-open upper)
_ICE_PRUNED_ORACLE = """
SELECT CAST(1 AS BIGINT) AS read_kind, COUNT(*) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM documents WHERE n_chars BETWEEN 100 AND 500
UNION ALL
SELECT CAST(2 AS BIGINT), COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM documents
WHERE sha256(text) = (SELECT sha256(text) FROM documents WHERE doc_id = 7)
UNION ALL
SELECT CAST(3 AS BIGINT), COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM documents WHERE doc_id BETWEEN 50 AND 199 AND n_chars <= 800
ORDER BY read_kind
"""

SOURCE_QUERIES["iceberg_pruned_reads"] = q_iceberg_pruned_reads
SOURCE_ORACLES["iceberg_pruned_reads"] = _ICE_PRUNED_ORACLE
