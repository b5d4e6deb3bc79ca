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

SOURCE_QUERIES = {"import_binary_roundtrip": q_import_binary_roundtrip}
SOURCE_ORACLES = {"import_binary_roundtrip": _ORACLE}
