"""JSONL (JSON-lines) document source/sink.

The interchange format real training corpora ship in (one JSON object
per line: Dolma, RedPajama, The Stack's raw drops). Reference parity:
the reference imports .tbl/CSV/binary (src/lib/import_export/); JSONL
is the training-data-pipeline extension of that seam, built on Spark's
native distributed JSON reader so pushdown/pruning/split-parallelism
are Catalyst's.

Schema discipline: always read with an explicit schema — schema
inference is a full extra pass over 100 TB and type-drifts on dirty
data. Malformed lines follow Spark's standard modes; PERMISSIVE keeps
them visible in a corrupt-record column instead of silently dropping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSON-lines with an explicit schema (required — inference is
    an extra full pass at corpus scale). In PERMISSIVE mode a corrupt
    line lands with every schema field NULL and the raw line in
    ``_corrupt_record``; DROPMALFORMED silently drops; FAILFAST raises."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write JSON-lines (one object per row, UTF-8). ``n_files`` bounds
    the output file count via coalesce (never a shuffle); leave None to
    keep the upstream partitioning — at corpus scale one file per task
    is the write-throughput-optimal layout."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").json(path)
