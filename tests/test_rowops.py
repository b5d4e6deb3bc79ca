"""Copy-on-write row ops (sources/rowops.py): MERGE upsert and DELETE
WHERE over snapshot tables — touched-file minimality, SQL NULL
semantics, key-uniqueness rejection, and composition with time travel,
schema evolution, and manifest stats."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.sources import icetable
from hyrise_generalized_dedup_spark.sources.icetable import (
    SnapshotError,
    create_table,
    incremental_scan,
    read_table,
)
from hyrise_generalized_dedup_spark.sources.rowops import delete_rows, merge_upsert


def _base(spark, root, n=80, files=8, stat_cols=None):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("v1-"), F.col("id")).alias("text"),
    )
    # key-ranged files so a narrow update provably touches few files
    create_table(spark, root, df.repartitionByRange(files, "doc_id"),
                 stat_cols=stat_cols)
    return df


def _rows(df):
    return sorted((r.doc_id, r.text) for r in df.collect())


@pytest.fixture()
def root(tmp_path) -> str:
    return str(tmp_path / "tbl")


def test_merge_updates_and_inserts(spark, root):
    _base(spark, root)
    updates = spark.range(78, 85).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("v2-"), F.col("id")).alias("text"),
    )
    snap, stats = merge_upsert(spark, root, updates)
    assert snap == 2
    want = [(i, f"v1-{i}") for i in range(78)] + [(i, f"v2-{i}") for i in range(78, 85)]
    assert _rows(read_table(spark, root)) == sorted(want)
    # pre-merge state intact under time travel
    assert _rows(read_table(spark, root, snapshot_id=1)) == [
        (i, f"v1-{i}") for i in range(80)
    ]
    # the two matched keys live in the last key-range file(s) only
    assert stats["n_files_rewritten"] <= 2
    assert stats["n_files_untouched"] >= 6


def test_merge_carries_untouched_files_by_reference(spark, root):
    _base(spark, root, stat_cols=["doc_id"])
    before = {f["path"]: f for f in icetable._read_manifest(spark, root, 1)["files"]}
    updates = spark.createDataFrame([(0, "patched")], "doc_id long, text string")
    snap, stats = merge_upsert(spark, root, updates)
    after = icetable._read_manifest(spark, root, snap)["files"]
    carried = [f for f in after if f["status"] == "existing"]
    assert len(carried) == stats["n_files_untouched"] > 0
    for f in carried:  # identical entries: same bytes, same stats
        assert f["path"] in before
        assert f["stats"] == before[f["path"]]["stats"]
    # rewritten files re-record stats too
    added = [f for f in after if f["status"] == "added"]
    assert added and all("stats" in f for f in added)


def test_merge_rejects_duplicate_update_keys(spark, root):
    _base(spark, root)
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b")], "doc_id long, text string"
    )
    with pytest.raises(SnapshotError, match="not unique"):
        merge_upsert(spark, root, dup)
    assert icetable.current_snapshot_id(spark, root) == 1  # nothing committed


def test_merge_insert_only_rewrites_nothing(spark, root):
    _base(spark, root)
    inserts = spark.createDataFrame([(500, "new")], "doc_id long, text string")
    snap, stats = merge_upsert(spark, root, inserts)
    assert stats["n_files_rewritten"] == 0
    assert stats["n_files_untouched"] == 8
    assert (500, "new") in _rows(read_table(spark, root))


def test_merge_with_schema_evolution(spark, root):
    _base(spark, root)
    updates = spark.createDataFrame(
        [(3, "v2-3", 99), (100, "new", 7)], "doc_id long, text string, stars long"
    )
    merge_upsert(spark, root, updates)
    cur = read_table(spark, root)
    assert cur.columns == ["doc_id", "text", "stars"]
    got = {r.doc_id: (r.text, r.stars) for r in cur.collect()}
    assert got[3] == ("v2-3", 99) and got[100] == ("new", 7)
    assert got[4] == ("v1-4", None)  # untouched rows: typed NULL backfill


def test_delete_where_and_null_semantics(spark, root):
    _base(spark, root, n=20, files=2)
    # make text NULL for two rows via a merge, so the predicate sees NULLs
    nulls = spark.createDataFrame(
        [(0, None), (1, None)], "doc_id long, text string"
    )
    merge_upsert(spark, root, nulls)
    snap, stats = delete_rows(spark, root, "length(text) >= 15")
    got = {r.doc_id for r in read_table(spark, root).collect()}
    # v1-10..v1-19 have length 5; none reach 15 -> predicate only TRUE
    # rows die; the NULL-text rows (condition NULL) must SURVIVE
    assert {0, 1} <= got
    assert got == set(range(20))  # nothing actually matched
    assert stats["n_files_rewritten"] == 0 and snap == 2  # no-op, no commit

    snap, stats = delete_rows(spark, root, "doc_id % 2 = 1 AND text IS NOT NULL")
    got = sorted(r.doc_id for r in read_table(spark, root).collect())
    assert got == [0, 1] + [i for i in range(2, 20) if i % 2 == 0]
    assert stats["n_files_rewritten"] >= 1


def test_delete_touches_only_containing_files(spark, root):
    _base(spark, root)  # 8 key-ranged files over 0..79
    snap, stats = delete_rows(spark, root, "doc_id < 5")
    assert stats["n_files_rewritten"] == 1
    assert stats["n_files_untouched"] == 7
    assert sorted(r.doc_id for r in read_table(spark, root).collect()) == list(range(5, 80))


def test_incremental_scan_refuses_row_op_ranges(spark, root):
    _base(spark, root)
    merge_upsert(
        spark, root,
        spark.createDataFrame([(0, "x")], "doc_id long, text string"),
    )
    with pytest.raises(SnapshotError, match="non-append"):
        incremental_scan(spark, root, from_snapshot_id=1).collect()
