"""Source readers: .tbl typed-header round trip (Import/Export parity)."""

from __future__ import annotations

from pyspark.sql.types import IntegerType, StringType

from hyrise_generalized_dedup_spark.sources.csv_tbl import (
    parse_tbl_header,
    read_csv_meta,
    read_tbl,
    write_csv_meta,
    write_tbl,
)


def test_csv_meta_roundtrip(spark, tmp_path):
    rows = [(1, "x,with,commas", 1.5), (2, None, -2.25), (3, 'quote"d', 0.0)]
    df = spark.createDataFrame(rows, "a int, b string, c double")
    p = str(tmp_path / "t.csv")
    write_csv_meta(df, p)
    import json

    meta = json.load(open(p + ".json"))
    assert [c["name"] for c in meta["columns"]] == ["a", "b", "c"]
    back = read_csv_meta(spark, p)
    got = sorted((r.a, r.b, r.c) for r in back.collect())
    assert got == sorted(rows)


def test_csv_meta_reads_reference_layout(spark, tmp_path):
    """A sidecar in the reference's exact JSON layout (columns[{name,
    nullable, type}], optional config) loads with declared types."""
    import json

    csv = tmp_path / "float.csv"
    csv.write_text("458.7\n456.7\n457.7\n")
    (tmp_path / "float.csv.json").write_text(
        json.dumps({"columns": [{"name": "a", "nullable": False, "type": "float"}]})
    )
    df = read_csv_meta(spark, str(csv))
    assert df.schema["a"].dataType.simpleString() == "float"
    assert df.count() == 3
    assert abs(df.agg({"a": "max"}).collect()[0][0] - 458.7) < 1e-4


def test_parse_header_nullable():
    schema = parse_tbl_header("a|b|c\n", "int|string_null|double\n")
    assert [f.name for f in schema.fields] == ["a", "b", "c"]
    assert schema.fields[0].dataType == IntegerType()
    assert schema.fields[1].nullable and not schema.fields[0].nullable


def test_tbl_roundtrip(spark, tmp_path):
    rows = [(1, "x", 1.5), (2, None, -2.25), (3, "null-ish", 0.0)]
    df = spark.createDataFrame(rows, "a int, b string, c double")
    p = str(tmp_path / "t.tbl")
    write_tbl(df, p)
    with open(p) as fh:
        assert fh.readline().strip() == "a|b|c"
        assert fh.readline().strip() == "int_null|string_null|double_null"
    back = read_tbl(spark, p)
    assert back.schema["a"].dataType == IntegerType()
    got = sorted((r.a, r.b, r.c) for r in back.collect())
    assert got == sorted(rows)


def test_tbl_keeps_data_row_that_looks_like_type_token(spark, tmp_path):
    """Regression: header rows are dropped positionally (load_table.cpp skips
    line 2), so a legitimate data row whose first column IS a type token
    ('string', 'int_null', ...) must survive the load."""
    p = tmp_path / "tricky.tbl"
    p.write_text("word|n\nstring|int\nstring|1\nint_null|2\ndouble|3\nhello|4\n")
    df = read_tbl(spark, str(p))
    got = sorted((r.word, r.n) for r in df.collect())
    assert got == [("double", 3), ("hello", 4), ("int_null", 2), ("string", 1)]


def test_tbl_matches_reference_format(spark, tmp_path):
    """A hand-written file in the reference's .tbl layout loads with the
    declared types (reference fixture format: resources/test_data/tbl/)."""
    p = tmp_path / "int_float.tbl"
    p.write_text("a|b\nint|float\n12345|458.7\n123|456.7\n1234|457.7\n")
    df = read_tbl(spark, str(p))
    assert df.count() == 3
    assert df.schema["b"].dataType.simpleString() == "float"
    assert df.agg({"a": "max"}).collect()[0][0] == 12345


def test_csv_meta_rfc4180_embedded_newlines_and_quotes(spark, tmp_path):
    """RFC-4180 mode (reference csv_parser.hpp:20-21): quoted fields may
    contain separators, escaped quotes, and embedded record delimiters."""
    import json

    csv = tmp_path / "rfc.csv"
    csv.write_text('1,"a,b"\n2,"line1\nline2"\n3,"she said ""hi"""\n4,null\n')
    (tmp_path / "rfc.csv.json").write_text(
        json.dumps(
            {
                "columns": [
                    {"name": "k", "nullable": False, "type": "int"},
                    {"name": "s", "nullable": True, "type": "string"},
                ],
                "config": {"rfc_mode": True},
            }
        )
    )
    got = {r.k: r.s for r in read_csv_meta(spark, str(csv)).collect()}
    assert got == {1: "a,b", 2: "line1\nline2", 3: 'she said "hi"', 4: None}
