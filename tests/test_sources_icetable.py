"""Snapshot-table (Iceberg-semantics) source: commits, time travel,
incremental scans, and the pipeline CLI seam (sources/icetable.py)."""

from __future__ import annotations

import re
from pathlib import Path

import pytest

import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.sources import icetable
from hyrise_generalized_dedup_spark.sources.icetable import (
    SnapshotError,
    append,
    create_table,
    current_snapshot_id,
    incremental_scan,
    overwrite,
    read_table,
    resolve_input,
    snapshots,
)
from hyrise_generalized_dedup_spark.testing import compare_to_duckdb


def _docs(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("content-"), F.col("id")).alias("text"),
    )


@pytest.fixture()
def root(tmp_path) -> str:
    return str(tmp_path / "tbl")


def _ids(df) -> list[int]:
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_create_append_read_current(spark, root):
    s1 = create_table(spark, root, _docs(spark, 0, 10))
    assert s1 == 1
    s2 = append(spark, root, _docs(spark, 10, 15))
    assert s2 == 2
    assert current_snapshot_id(spark, root) == 2
    assert _ids(read_table(spark, root)) == list(range(15))


def test_time_travel_reads_old_state(spark, root):
    create_table(spark, root, _docs(spark, 0, 10))
    append(spark, root, _docs(spark, 10, 15))
    assert _ids(read_table(spark, root, snapshot_id=1)) == list(range(10))
    # rows carry the full schema at every snapshot
    row = read_table(spark, root, snapshot_id=1).filter(F.col("doc_id") == 3)
    assert row.collect()[0].text == "content-3"


def test_overwrite_replaces_but_history_remains(spark, root):
    create_table(spark, root, _docs(spark, 0, 10))
    overwrite(spark, root, _docs(spark, 100, 103))
    assert _ids(read_table(spark, root)) == [100, 101, 102]
    assert _ids(read_table(spark, root, snapshot_id=1)) == list(range(10))
    ops = [s["operation"] for s in snapshots(spark, root)]
    assert ops == ["append", "overwrite"]


def test_incremental_scan_exact_appended_rows(spark, root):
    create_table(spark, root, _docs(spark, 0, 10))
    append(spark, root, _docs(spark, 10, 15))
    append(spark, root, _docs(spark, 15, 18))
    assert _ids(incremental_scan(spark, root, 1)) == list(range(10, 18))
    assert _ids(incremental_scan(spark, root, 1, to_snapshot_id=2)) == list(
        range(10, 15)
    )
    assert _ids(incremental_scan(spark, root, 2)) == list(range(15, 18))


def test_incremental_scan_empty_range_keeps_schema(spark, root):
    create_table(spark, root, _docs(spark, 0, 5))
    out = incremental_scan(spark, root, 1, to_snapshot_id=1)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "text"}


def test_incremental_scan_refuses_overwrite_in_range(spark, root):
    create_table(spark, root, _docs(spark, 0, 5))
    overwrite(spark, root, _docs(spark, 100, 103))
    append(spark, root, _docs(spark, 200, 202))
    with pytest.raises(SnapshotError, match="non-append"):
        incremental_scan(spark, root, 1)
    # a pure-append subrange after the overwrite is still fine
    assert _ids(incremental_scan(spark, root, 2)) == [200, 201]


def test_unknown_snapshot_and_missing_table_raise(spark, root):
    with pytest.raises(SnapshotError, match="no snapshot table"):
        read_table(spark, root)
    create_table(spark, root, _docs(spark, 0, 5))
    with pytest.raises(SnapshotError, match="unknown snapshot"):
        read_table(spark, root, snapshot_id=7)
    with pytest.raises(SnapshotError, match="not in log"):
        incremental_scan(spark, root, 5)
    with pytest.raises(SnapshotError, match="already exists"):
        create_table(spark, root, _docs(spark, 0, 5))


def test_commit_is_deterministic_and_crash_safe_ordering(spark, root):
    """Half-committed snapshots are invisible: the hint flips last, so a
    table with extra unreferenced data/metadata still reads the prior
    state (we simulate a dead commit by writing orphan files)."""
    create_table(spark, root, _docs(spark, 0, 5))
    from hyrise_generalized_dedup_spark import fsutil

    # orphan data + manifest from a "crashed" commit, hint NOT flipped
    _docs(spark, 50, 55).write.parquet(fsutil.urljoin(root, "data/s2"))
    fsutil.write_text(spark, fsutil.urljoin(root, "metadata/snap-2.json"), "{}")
    assert current_snapshot_id(spark, root) == 1
    assert _ids(read_table(spark, root)) == list(range(5))


def test_resolve_input_cli_forms(spark, root):
    create_table(spark, root, _docs(spark, 0, 6))
    append(spark, root, _docs(spark, 6, 9))
    assert resolve_input(spark, f"iceberg:{root}").count() == 9
    assert resolve_input(spark, f"iceberg:{root}@1").count() == 6


def test_read_plan_stays_parquet_native(spark, root):
    """The manifest layer must not cost Catalyst anything: a filtered
    projection over a snapshot read still shows parquet pushdown."""
    create_table(spark, root, _docs(spark, 0, 100))
    plan = (
        read_table(spark, root)
        .filter(F.col("doc_id") > 90)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,90)]" in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_metadata_layer_uses_fs_api_only():
    """Same discipline as the checkpoint layer: table roots may be object
    stores, so no raw POSIX calls in icetable.py."""
    src = Path(icetable.__file__).read_text()
    assert not re.search(r"\bos\.path\.|\bopen\(|\bos\.makedirs|\bshutil\.", src)


def test_cli_pipeline_reads_iceberg_input(spark, tmp_path):
    """--input iceberg:<root>@N feeds the dedup pipeline a time-traveled
    snapshot (subprocess, CLI surface)."""
    import json
    import os
    import subprocess
    import sys

    from hyrise_generalized_dedup_spark.synth import generate, to_spark

    root = str(tmp_path / "corpus_tbl")
    corpus = to_spark(spark, generate(n_rows=300))
    create_table(spark, root, corpus.limit(200))
    append(spark, root, corpus)  # snapshot 2 re-appends everything
    out = str(tmp_path / "ice_out")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "hyrise_generalized_dedup_spark.dedup.pipeline",
            "--input", f"iceberg:{root}@1",
            "--output", out,
            "--master", "local[2]",
            "--no-suffix",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_files"] == 200  # snapshot 1, not the 500-row current
    assert summary["n_clusters"] > 0


def test_iceberg_gate_matches_duckdb_oracle(spark, sf_tiny):
    from hyrise_generalized_dedup_spark.sources.queries import (
        SOURCE_ORACLES,
        SOURCE_QUERIES,
    )

    ok, msg = compare_to_duckdb(
        SOURCE_QUERIES["iceberg_time_travel"](spark, sf_tiny),
        SOURCE_ORACLES["iceberg_time_travel"],
        sf_tiny,
    )
    assert ok, msg


def test_iceberg_snapshots_feed_incremental_dedup(spark, tmp_path):
    """The intended production loop: full pipeline over snapshot 1, an
    append commit, then incremental_update over the CURRENT table read —
    final clusters bit-equal a from-scratch run over the same read."""
    import shutil

    import pyspark.sql.functions as F2

    from hyrise_generalized_dedup_spark.config import GDConfig
    from hyrise_generalized_dedup_spark.dedup.incremental import incremental_update
    from hyrise_generalized_dedup_spark.dedup.pipeline import (
        Checkpointer,
        run_pipeline,
    )
    from hyrise_generalized_dedup_spark.synth import generate, to_spark

    full = to_spark(spark, generate(n_rows=300, seed=21)).cache()
    old = full.filter(F2.abs(F2.hash("commit")) % 4 < 3)
    new = full.filter(F2.abs(F2.hash("commit")) % 4 >= 3)

    tbl = str(tmp_path / "corpus_tbl")
    create_table(spark, tbl, old)
    run_pipeline(spark, read_table(spark, tbl), str(tmp_path / "inc"), resume=False)
    append(spark, tbl, new)
    summary = incremental_update(
        spark, read_table(spark, tbl), str(tmp_path / "inc")
    )
    assert summary["n_new_files"] == new.count() > 0

    run_pipeline(
        spark, read_table(spark, tbl), str(tmp_path / "scratch"), resume=False
    )

    def rows(out_dir: str, stage: str):
        df = Checkpointer(spark, out_dir, GDConfig()).load(stage)
        return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())

    for stage in ("edges", "clusters", "suffix"):
        assert rows(str(tmp_path / "inc"), stage) == rows(
            str(tmp_path / "scratch"), stage
        ), f"stage {stage} diverged (iceberg-fed incremental vs scratch)"
    shutil.rmtree(str(tmp_path / "inc"), ignore_errors=True)
    shutil.rmtree(str(tmp_path / "scratch"), ignore_errors=True)


def test_snapshot_diff_classifies_every_change_kind(spark, tmp_path):
    """Explicit add/remove/modify/unchanged fixture across an overwrite,
    keyed on a composite (repo, path) key."""
    from hyrise_generalized_dedup_spark.sources.icetable import (
        create_table,
        overwrite,
        snapshot_diff,
    )

    schema = "repo string, path string, content string"
    old = spark.createDataFrame(
        [
            ("r1", "a.py", "alpha"),
            ("r1", "b.py", "beta"),
            ("r2", "a.py", "gamma"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            ("r1", "a.py", "alpha"),       # unchanged
            ("r1", "b.py", "beta-v2"),     # modified
            ("r3", "z.py", "zeta"),        # added (r2/a.py removed)
        ],
        schema,
    )
    root = str(tmp_path / "tbl")
    s1 = create_table(spark, root, old)
    overwrite(spark, root, new)
    got = {
        (r["repo"], r["path"]): r["change"]
        for r in snapshot_diff(
            spark, root, from_snapshot_id=s1, key_cols=("repo", "path")
        ).collect()
    }
    assert got == {
        ("r1", "a.py"): "unchanged",
        ("r1", "b.py"): "modified",
        ("r2", "a.py"): "removed",
        ("r3", "z.py"): "added",
    }


def test_snapshot_diff_of_append_matches_incremental_scan(spark, tmp_path):
    """On an append-only range, diff 'added' keys == incremental_scan rows."""
    import pyspark.sql.functions as F2

    from hyrise_generalized_dedup_spark.sources.icetable import (
        append,
        create_table,
        incremental_scan,
        snapshot_diff,
    )

    docs = spark.range(40).select(
        F2.col("id").alias("doc_id"), F2.concat(F2.lit("t"), "id").alias("text")
    )
    root = str(tmp_path / "tbl")
    s1 = create_table(spark, root, docs.filter("doc_id < 25"))
    append(spark, root, docs.filter("doc_id >= 25"))
    diff = snapshot_diff(spark, root, from_snapshot_id=s1)
    added = {r["doc_id"] for r in diff.filter("change = 'added'").collect()}
    inc = {
        r["doc_id"]
        for r in incremental_scan(spark, root, from_snapshot_id=s1).collect()
    }
    assert added == inc == set(range(25, 40))
    assert diff.filter("change != 'added'").filter("change != 'unchanged'").count() == 0


def test_streaming_ingest_feeds_snapshot_table_and_incremental(spark, tmp_path):
    """The full production ingest loop: a file STREAM commits each
    microbatch into the snapshot table via foreachBatch (atomic append
    commits), then incremental dedup absorbs the current table read —
    final stages bit-equal a from-scratch run over the same read."""
    import pyspark.sql.functions as F2

    from hyrise_generalized_dedup_spark.config import GDConfig
    from hyrise_generalized_dedup_spark.dedup.incremental import incremental_update
    from hyrise_generalized_dedup_spark.dedup.pipeline import (
        Checkpointer,
        run_pipeline,
    )
    from hyrise_generalized_dedup_spark.synth import generate, to_spark

    full = to_spark(spark, generate(n_rows=240, seed=31)).cache()
    old = full.filter(F2.abs(F2.hash("commit")) % 3 != 0)
    new = full.filter(F2.abs(F2.hash("commit")) % 3 == 0)

    tbl = str(tmp_path / "tbl")
    create_table(spark, tbl, old)
    run_pipeline(spark, read_table(spark, tbl), str(tmp_path / "inc"), resume=False)

    # stream the new batch in: parquet file source -> foreachBatch append
    src = str(tmp_path / "ingest_src")
    new.repartition(3).write.parquet(src)  # several files -> microbatches
    n_commits = []

    def commit_batch(batch_df, _batch_id):
        if batch_df.count():
            n_commits.append(append(spark, tbl, batch_df))

    (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", str(tmp_path / "stream_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    assert len(n_commits) >= 2, "expected multiple microbatch commits"

    summary = incremental_update(spark, read_table(spark, tbl), str(tmp_path / "inc"))
    assert summary["n_new_files"] == new.count() > 0
    run_pipeline(spark, read_table(spark, tbl), str(tmp_path / "scratch"), resume=False)

    def rows(out_dir, stage):
        df = Checkpointer(spark, out_dir, GDConfig()).load(stage)
        return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())

    for stage in ("edges", "clusters", "suffix"):
        assert rows(str(tmp_path / "inc"), stage) == rows(
            str(tmp_path / "scratch"), stage
        ), f"stage {stage} diverged (streamed-ingest incremental vs scratch)"


def test_snapshot_diff_digest_is_injective(spark, tmp_path):
    """Separator-smuggling and NULL-sentinel collisions must register as
    modified: per-column hashing keeps the row encoding injective."""
    from hyrise_generalized_dedup_spark.sources.icetable import (
        create_table,
        overwrite,
        snapshot_diff,
    )

    schema = "doc_id long, a string, b string"
    old = spark.createDataFrame(
        [(1, "x\x1f", "y"), (2, "\x00", "z"), (3, "p", "q")], schema
    )
    new = spark.createDataFrame(
        [(1, "x", "\x1fy"), (2, None, "z"), (3, "p", "q")], schema
    )
    root = str(tmp_path / "tbl")
    s1 = create_table(spark, root, old)
    overwrite(spark, root, new)
    got = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(spark, root, from_snapshot_id=s1).collect()
    }
    assert got == {1: "modified", 2: "modified", 3: "unchanged"}


# ---------------------------------------------------------------------------
# schema evolution (round-5: the Iceberg spec's add-column case)


def _docs3(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("content-"), F.col("id")).alias("text"),
        (F.col("id") % 7).alias("stars"),
    )


def test_append_with_new_column_backfills_nulls(spark, tmp_path):
    root = str(tmp_path / "evo")
    create_table(spark, root, _docs(spark, 0, 5))        # doc_id, text
    append(spark, root, _docs3(spark, 5, 10))            # + stars
    cur = read_table(spark, root)
    assert cur.columns == ["doc_id", "text", "stars"]    # prior order + new
    rows = {r.doc_id: r.stars for r in cur.collect()}
    assert all(rows[i] is None for i in range(5))        # typed NULL backfill
    assert all(rows[i] == i % 7 for i in range(5, 10))
    # time travel shows the OLD schema at the old snapshot
    assert read_table(spark, root, snapshot_id=1).columns == ["doc_id", "text"]
    sch = icetable.table_schema(spark, root)
    assert [f.name for f in sch.fields] == ["doc_id", "text", "stars"]
    assert sch["stars"].dataType.simpleString() == "bigint"


def test_append_missing_column_reads_as_null(spark, tmp_path):
    """A writer that predates-or-omits a committed column must not drop
    it from the table: its rows read as NULL under the table schema."""
    root = str(tmp_path / "evo2")
    create_table(spark, root, _docs3(spark, 0, 5))
    append(spark, root, _docs(spark, 5, 10))             # no stars column
    cur = read_table(spark, root)
    assert cur.columns == ["doc_id", "text", "stars"]
    rows = {r.doc_id: r.stars for r in cur.collect()}
    assert all(rows[i] == i % 7 for i in range(5))
    assert all(rows[i] is None for i in range(5, 10))


def test_type_change_is_refused(spark, tmp_path):
    root = str(tmp_path / "evo3")
    create_table(spark, root, _docs(spark, 0, 5))
    bad = spark.range(5, 8).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("double").alias("text"),        # text: string -> double
    )
    with pytest.raises(SnapshotError, match="cannot change column 'text'"):
        append(spark, root, bad)
    # the failed commit left the table readable at the prior state
    assert len(read_table(spark, root).collect()) == 5


def test_overwrite_resets_mixed_schema_but_keeps_columns(spark, tmp_path):
    root = str(tmp_path / "evo4")
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs3(spark, 5, 10))
    assert icetable._read_manifest(spark, root, 2)["mixed_schema"] is True
    overwrite(spark, root, _docs(spark, 0, 3))           # single-schema files
    man = icetable._read_manifest(spark, root, 3)
    assert man["mixed_schema"] is False                  # footer-merge cost gone
    cur = read_table(spark, root)
    assert cur.columns == ["doc_id", "text", "stars"]    # schema never shrinks
    assert all(r.stars is None for r in cur.collect())


def test_incremental_scan_projects_current_schema(spark, tmp_path):
    root = str(tmp_path / "evo5")
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs3(spark, 5, 10))
    append(spark, root, _docs(spark, 10, 12))
    inc = incremental_scan(spark, root, from_snapshot_id=1)
    assert inc.columns == ["doc_id", "text", "stars"]
    rows = {r.doc_id: r.stars for r in inc.collect()}
    assert set(rows) == set(range(5, 12))
    assert rows[6] == 6 % 7 and rows[11] is None


def test_unevolved_tables_stay_single_schema_reads(spark, tmp_path):
    root = str(tmp_path / "evo6")
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs(spark, 5, 10))
    assert icetable._read_manifest(spark, root, 2)["mixed_schema"] is False


def test_compaction_materializes_schema_evolution(spark, tmp_path):
    """Rewriting mixed-schema files normalizes them to the current table
    schema — the compacted snapshot is single-schema again."""
    from hyrise_generalized_dedup_spark.sources.maintenance import compact_table

    root = str(tmp_path / "evo7")
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs3(spark, 5, 10))
    before = sorted((r.doc_id, r.text, r.stars)
                    for r in read_table(spark, root).collect())
    snap, stats = compact_table(spark, root, target_bytes=1 << 30)
    assert stats["compacted"]
    man = icetable._read_manifest(spark, root, snap)
    assert man["mixed_schema"] is False
    after = sorted((r.doc_id, r.text, r.stars)
                   for r in read_table(spark, root).collect())
    assert after == before


# ---------------------------------------------------------------------------
# manifest file statistics + metadata-pruned scans (round-5)


def _grid_tbl(spark, root, n=64, parts=8, stat_cols=("x", "y")):
    grid = spark.range(n * n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    create_table(spark, root, grid.repartition(parts), stat_cols=list(stat_cols))
    return n


def test_manifest_records_per_file_stats(spark, tmp_path):
    root = str(tmp_path / "st1")
    _grid_tbl(spark, root)
    files = icetable._read_manifest(spark, root, 1)["files"]
    assert all("stats" in f for f in files)
    for f in files:
        for c in ("x", "y"):
            lo, hi = f["stats"][c]
            assert 0 <= lo <= hi <= 63


def test_scan_table_prunes_files_and_matches_brute_filter(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import scan_table
    from hyrise_generalized_dedup_spark.sources.maintenance import compact_table

    root = str(tmp_path / "st2")
    n = _grid_tbl(spark, root)
    # z-cluster so per-file bounds are tight on BOTH dims, then scan a box
    compact_table(spark, root, target_bytes=1 << 10, zorder_cols=["x", "y"])
    full = read_table(spark, root)
    got = scan_table(spark, root, {"x": (0, 7), "y": (8, 15)})
    want = sorted(
        (r.doc_id, r.x, r.y)
        for r in full.filter((F.col("x") <= 7) & F.col("y").between(8, 15)).collect()
    )
    assert sorted((r.doc_id, r.x, r.y) for r in got.collect()) == want
    # the pruning is real: the box scan lists a strict subset of files
    assert 0 < len(got.inputFiles()) < len(full.inputFiles())
    # and a z-slab this small touches a small corner of the table
    assert len(got.inputFiles()) <= len(full.inputFiles()) // 2


def test_scan_table_half_open_bounds_and_empty_box(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import scan_table

    root = str(tmp_path / "st3")
    n = _grid_tbl(spark, root)
    lo_half = scan_table(spark, root, {"x": (None, 1)})
    assert sorted(r.x for r in lo_half.collect()) == [0] * n + [1] * n
    empty = scan_table(spark, root, {"x": (1000, None)})
    assert empty.columns == ["doc_id", "x", "y"]
    assert empty.count() == 0 and len(empty.inputFiles()) == 0


def test_stats_inherited_by_append_and_absent_cols_stay_safe(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import scan_table

    root = str(tmp_path / "st4")
    _grid_tbl(spark, root, n=8, parts=2)
    # an evolved append that LACKS the y stat column: its files carry x
    # stats only and must survive any y-bounded scan
    extra = spark.range(64, 80).select(
        F.col("id").alias("doc_id"), (F.col("id") % 8).alias("x")
    )
    append(spark, root, extra)
    files = icetable._read_manifest(spark, root, 2)["files"]
    new = [f for f in files if f["added_snapshot_id"] == 2]
    assert new and all("y" not in f["stats"] and "x" in f["stats"] for f in new)
    got = scan_table(spark, root, {"y": (0, 0)})
    # rows from the evolved files have y NULL -> filtered out by the
    # residual, but the FILES were kept (soundness), x stats still recorded
    assert sorted(r.doc_id for r in got.collect()) == list(range(8))


def test_stat_cols_validation(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import scan_table

    root = str(tmp_path / "st5")
    df = spark.range(4).select(F.col("id").alias("doc_id"))
    with pytest.raises(SnapshotError, match="not in table columns"):
        create_table(spark, root, df, stat_cols=["nope"])
    df2 = df.select("doc_id", F.array(F.lit(1)).alias("arr"))
    with pytest.raises(SnapshotError, match="manifest stats support"):
        create_table(spark, root, df2, stat_cols=["arr"])
    create_table(spark, root, df, stat_cols=["doc_id"])
    with pytest.raises(SnapshotError, match="unknown scan column"):
        scan_table(spark, root, {"ghost": (0, 1)}).collect()


# ---------------------------------------------------------------------------
# per-file Bloom filters + point lookups (round-5)


def _sha_table(spark, root, n=2048, files=16):
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("content-"), F.col("id").cast("string")), 256).alias("sha"),
    )
    create_table(spark, root, docs.repartition(files),
                 stat_cols=["doc_id"], bloom_cols=["sha", "doc_id"])
    return docs


def test_point_lookup_prunes_files_no_false_negatives(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import point_lookup

    root = str(tmp_path / "bl1")
    _sha_table(spark, root)
    files = icetable._read_manifest(spark, root, 1)["files"]
    assert all("bloom" in f and {"sha", "doc_id"} <= set(f["bloom"]) for f in files)
    full_files = len(read_table(spark, root).inputFiles())
    assert full_files == 16

    # no false negatives: every sampled key resolves to exactly its row
    sample = read_table(spark, root).filter(F.col("doc_id") % 97 == 3).collect()
    assert len(sample) >= 20
    pruned_counts = []
    for r in sample[:20]:
        got = point_lookup(spark, root, "sha", r.sha)
        rows = got.collect()
        assert [(x.doc_id, x.sha) for x in rows] == [(r.doc_id, r.sha)]
        pruned_counts.append(len(got.inputFiles()))
    # the pruning is real: a sha lives in ONE file; FP rate at 16 bits/key
    # is ~0.3%/file, so the average probe should touch ~1 file
    assert sum(pruned_counts) <= 2 * len(pruned_counts)

    # integer-keyed lookup hashes identically via the string rendering
    got = point_lookup(spark, root, "doc_id", 1234)
    assert [x.doc_id for x in got.collect()] == [1234]
    assert len(got.inputFiles()) <= 4


def test_point_lookup_miss_and_statless_soundness(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import point_lookup

    root = str(tmp_path / "bl2")
    _sha_table(spark, root, n=512, files=8)
    miss = point_lookup(spark, root, "sha", "f" * 64)
    assert miss.count() == 0
    assert len(miss.inputFiles()) <= 2  # ~all files bloom-rejected

    # a bloom-less table still answers correctly (every file kept)
    root2 = str(tmp_path / "bl3")
    create_table(spark, root2, spark.range(64).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    ).repartition(4))
    got = point_lookup(spark, root2, "text", "t7")
    assert [r.doc_id for r in got.collect()] == [7]
    assert len(got.inputFiles()) == 4  # nothing to prune with -> scan all


def test_bloom_inherited_by_append_and_validated(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import point_lookup

    root = str(tmp_path / "bl4")
    docs = _sha_table(spark, root, n=256, files=4)
    extra = spark.range(256, 320).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("content-"), F.col("id").cast("string")), 256).alias("sha"),
    )
    append(spark, root, extra.repartition(2))
    new = [f for f in icetable._read_manifest(spark, root, 2)["files"]
           if f["added_snapshot_id"] == 2]
    assert new and all("bloom" in f for f in new)
    target = extra.filter(F.col("doc_id") == 300).collect()[0]
    got = point_lookup(spark, root, "sha", target.sha)
    assert [r.doc_id for r in got.collect()] == [300]

    with pytest.raises(SnapshotError, match="manifest blooms support"):
        create_table(
            spark, str(tmp_path / "bl5"),
            spark.range(4).select(F.col("id").cast("double").alias("v")),
            bloom_cols=["v"],
        )
    with pytest.raises(SnapshotError, match="unknown lookup column"):
        point_lookup(spark, root, "ghost", "x").collect()


# ---------------------------------------------------------------------------
# tag refs (release pins) + monotone metadata versions (round-5)


def test_tags_pin_read_and_cli_forms(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import (
        create_tag, drop_tag, list_refs,
    )

    root = str(tmp_path / "tags")
    create_table(spark, root, _docs(spark, 0, 10))
    append(spark, root, _docs(spark, 10, 20))
    create_tag(spark, root, "train-v1", snapshot_id=1)
    create_tag(spark, root, "latest")  # default: current snapshot
    assert list_refs(spark, root) == {"train-v1": 1, "latest": 2}

    assert _ids(read_table(spark, root, snapshot_id="train-v1")) == list(range(10))
    assert _ids(resolve_input(spark, f"iceberg:{root}@train-v1")) == list(range(10))
    assert _ids(resolve_input(spark, f"iceberg:{root}@2")) == list(range(20))

    with pytest.raises(SnapshotError, match="already exists"):
        create_tag(spark, root, "latest")
    with pytest.raises(SnapshotError, match="unknown snapshot"):
        create_tag(spark, root, "ghost", snapshot_id=99)
    with pytest.raises(SnapshotError, match="no tag"):
        read_table(spark, root, snapshot_id="nope")
    drop_tag(spark, root, "latest")
    assert list_refs(spark, root) == {"train-v1": 1}


def test_expiry_never_drops_tagged_snapshots(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import (
        create_tag, drop_tag,
    )
    from hyrise_generalized_dedup_spark.sources.maintenance import (
        expire_snapshots,
    )

    root = str(tmp_path / "tagexp")
    create_table(spark, root, _docs(spark, 0, 5))     # s1 <- tagged
    overwrite(spark, root, _docs(spark, 0, 8))        # s2
    append(spark, root, _docs(spark, 8, 12))          # s3
    append(spark, root, _docs(spark, 12, 15))         # s4
    create_tag(spark, root, "train-v1", snapshot_id=1)

    out = expire_snapshots(spark, root, keep_last=1)
    assert out["expired"] == [2, 3]                   # s1 pinned, s4 recent
    assert _ids(read_table(spark, root, snapshot_id="train-v1")) == list(range(5))
    assert _ids(read_table(spark, root)) == list(range(15))
    with pytest.raises(SnapshotError):
        read_table(spark, root, snapshot_id=2)

    # dropping the pin releases the release: next expiry collects s1
    drop_tag(spark, root, "train-v1")
    out = expire_snapshots(spark, root, keep_last=1)
    assert out["expired"] == [1]
    with pytest.raises(SnapshotError):
        read_table(spark, root, snapshot_id=1)
    assert _ids(read_table(spark, root)) == list(range(15))


def test_metadata_versions_stay_monotone_after_expiry(spark, tmp_path):
    """Regression: version numbers derived from the snapshot-log LENGTH
    collide with older metadata files once an expiry shrinks the log —
    the hint would move backwards and overwrite history. Versions must
    be monotone (prior hint + 1) across commits, tags, and expiry."""
    from hyrise_generalized_dedup_spark.sources.maintenance import (
        expire_snapshots,
    )

    root = str(tmp_path / "mono")
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs(spark, 5, 10))
    append(spark, root, _docs(spark, 10, 15))
    assert icetable._current_version(spark, root) == 3
    expire_snapshots(spark, root, keep_last=1)
    assert icetable._current_version(spark, root) == 4
    append(spark, root, _docs(spark, 15, 20))         # must NOT write v3 again
    assert icetable._current_version(spark, root) == 5
    assert _ids(read_table(spark, root)) == list(range(20))
    assert [s["snapshot_id"] for s in snapshots(spark, root)] == [3, 4]


# ---------------------------------------------------------------------------
# rollback


def test_rollback_restores_earlier_state_and_schema(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import rollback_table

    root = str(tmp_path / "tbl")
    create_table(spark, root, _docs(spark, 0, 10))
    append(spark, root, _docs(spark, 10, 15))
    # evolve the schema in the bad commit so rollback must revert it too
    bad = _docs(spark, 15, 20).withColumn("lang", F.lit("py"))
    s3 = append(spark, root, bad)
    assert set(read_table(spark, root).columns) == {"doc_id", "text", "lang"}

    assert rollback_table(spark, root, 2) == 2
    assert current_snapshot_id(spark, root) == 2
    assert _ids(read_table(spark, root)) == list(range(15))
    assert set(read_table(spark, root).columns) == {"doc_id", "text"}
    # the rolled-off snapshot stays readable (roll FORWARD works)
    assert _ids(read_table(spark, root, s3)) == list(range(20))
    assert rollback_table(spark, root, s3) == s3
    assert _ids(read_table(spark, root)) == list(range(20))


def test_rollback_validation_and_noop(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import rollback_table

    root = str(tmp_path / "tbl")
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs(spark, 5, 8))
    with pytest.raises(SnapshotError, match="unknown snapshot"):
        rollback_table(spark, root, 99)
    v_before = icetable._current_version(spark, root)
    assert rollback_table(spark, root, 2) == 2  # already current: no-op
    assert icetable._current_version(spark, root) == v_before


def test_rollback_by_tag_name(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import (
        create_tag,
        rollback_table,
    )

    root = str(tmp_path / "tbl")
    create_table(spark, root, _docs(spark, 0, 5))
    create_tag(spark, root, "train-v1")
    append(spark, root, _docs(spark, 5, 9))
    assert rollback_table(spark, root, "train-v1") == 1
    assert _ids(read_table(spark, root)) == list(range(5))
    with pytest.raises(SnapshotError, match="no tag"):
        rollback_table(spark, root, "nope")


def test_commit_after_rollback_never_reuses_snapshot_ids(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import rollback_table

    root = str(tmp_path / "tbl")
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs(spark, 5, 8))   # snap 2
    append(spark, root, _docs(spark, 8, 11))  # snap 3
    rollback_table(spark, root, 1)
    s4 = append(spark, root, _docs(spark, 11, 13))
    assert s4 == 4  # NOT 2: ids allocate past the newest ever assigned
    # the new lineage is 1 -> 4; snapshots 2 and 3 are rolled off but intact
    assert _ids(read_table(spark, root)) == list(range(5)) + [11, 12]
    assert _ids(read_table(spark, root, 3)) == list(range(11))
    assert [s["snapshot_id"] for s in snapshots(spark, root)] == [1, 2, 3, 4]


def test_expiry_pins_the_current_snapshot_after_rollback(spark, tmp_path):
    from hyrise_generalized_dedup_spark.sources.icetable import rollback_table
    from hyrise_generalized_dedup_spark.sources.maintenance import (
        expire_snapshots,
    )

    root = str(tmp_path / "tbl")
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs(spark, 5, 8))
    append(spark, root, _docs(spark, 8, 11))
    rollback_table(spark, root, 1)
    rep = expire_snapshots(spark, root, keep_last=1)
    # snapshot 1 is current -> pinned even though only "the last 1" is kept
    assert 1 not in rep["expired"]
    assert _ids(read_table(spark, root)) == list(range(5))
    # snapshot 1's data files survived the sweep
    assert _ids(read_table(spark, root, 1)) == list(range(5))
