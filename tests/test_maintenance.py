"""Snapshot-table maintenance (sources/maintenance.py): snapshot expiry
GC and small-file compaction over the Iceberg-semantics tables of
sources/icetable.py. The invariants: current contents are bit-equal
across every maintenance op, retained history stays readable, expired
history raises, and only genuinely unreferenced bytes are deleted."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from hyrise_generalized_dedup_spark.sources import icetable
from hyrise_generalized_dedup_spark.sources.icetable import (
    SnapshotError,
    append,
    create_table,
    incremental_scan,
    overwrite,
    read_table,
    snapshots,
)
from hyrise_generalized_dedup_spark.sources.maintenance import (
    compact_table,
    expire_snapshots,
    table_file_census,
)
from hyrise_generalized_dedup_spark import fsutil


def _docs(spark, lo: int, hi: int, parts: int = 1):
    df = spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("content-"), F.col("id")).alias("text"),
    )
    return df.repartition(parts)


def _rows(df) -> list[tuple]:
    return sorted((r.doc_id, r.text) for r in df.collect())


@pytest.fixture()
def root(tmp_path) -> str:
    return str(tmp_path / "tbl")


# ---------------------------------------------------------------------------
# compaction


def test_compact_preserves_rows_and_reduces_files(spark, root):
    create_table(spark, root, _docs(spark, 0, 40, parts=4))
    append(spark, root, _docs(spark, 40, 80, parts=4))
    before = _rows(read_table(spark, root))
    n_before = table_file_census(spark, root)["n_files"]
    assert n_before == 8

    snap, stats = compact_table(spark, root, target_bytes=1 << 30)
    assert stats["compacted"] and stats["n_rewritten"] == 8
    assert stats["n_output_files"] < n_before
    assert table_file_census(spark, root)["n_files"] == stats["n_output_files"]
    assert _rows(read_table(spark, root)) == before
    # history intact: both pre-compaction snapshots still time-travel
    assert len(_rows(read_table(spark, root, snapshot_id=1))) == 40
    assert len(_rows(read_table(spark, root, snapshot_id=2))) == 80
    assert snapshots(spark, root)[-1]["operation"] == "replace"
    assert snap == 3


def test_compact_keeps_large_files_by_reference(spark, root):
    create_table(spark, root, _docs(spark, 0, 50, parts=1))   # one big file
    append(spark, root, _docs(spark, 50, 60, parts=4))        # four small
    files = icetable._read_manifest(spark, root, 2)["files"]
    big = max(files, key=lambda f: int(f["bytes"]))
    cutoff = int(big["bytes"])  # big file is >= 0.75 * target below

    snap, stats = compact_table(spark, root, target_bytes=cutoff)
    assert stats["compacted"] and stats["n_kept"] >= 1
    new_files = icetable._read_manifest(spark, root, snap)["files"]
    carried = [f for f in new_files if f["path"] == big["path"]]
    assert carried and carried[0]["status"] == "existing"
    assert _rows(read_table(spark, root)) == [
        (i, f"content-{i}") for i in range(60)
    ]


def test_compact_noop_when_already_compact(spark, root):
    create_table(spark, root, _docs(spark, 0, 10, parts=1))
    cur = icetable.current_snapshot_id(spark, root)
    snap, stats = compact_table(spark, root, target_bytes=1 << 30)
    assert snap == cur and not stats["compacted"]
    assert icetable.current_snapshot_id(spark, root) == cur  # no new commit


def test_compact_rejects_bad_target_and_blocks_incremental(spark, root):
    create_table(spark, root, _docs(spark, 0, 10, parts=2))
    with pytest.raises(ValueError):
        compact_table(spark, root, target_bytes=0)
    append(spark, root, _docs(spark, 10, 20, parts=2))
    compact_table(spark, root, target_bytes=1 << 30)
    # the replace commit is not an append: file-level incremental refuses
    with pytest.raises(SnapshotError):
        incremental_scan(spark, root, from_snapshot_id=1).collect()


# ---------------------------------------------------------------------------
# snapshot expiry


def _live_disk_paths(spark, root, snap) -> set[str]:
    return {
        f["path"] for f in icetable._read_manifest(spark, root, snap)["files"]
    }


def test_expire_deletes_only_unreferenced_files(spark, root):
    create_table(spark, root, _docs(spark, 0, 10, parts=2))   # s1
    overwrite(spark, root, _docs(spark, 0, 20, parts=2))      # s2 (s1 orphaned)
    append(spark, root, _docs(spark, 20, 30, parts=2))        # s3
    before = _rows(read_table(spark, root))
    s1_paths = _live_disk_paths(spark, root, 1)
    s3_paths = _live_disk_paths(spark, root, 3)

    stats = expire_snapshots(spark, root, keep_last=2)
    assert stats["expired"] == [1]
    assert stats["n_deleted_files"] == len(s1_paths)  # s1's files orphaned
    assert stats["freed_bytes"] > 0
    # s1's bytes are gone from disk, s2/s3's survive
    for p in s1_paths:
        assert not fsutil.exists(spark, fsutil.urljoin(root, p))
    for p in s3_paths:
        assert fsutil.exists(spark, fsutil.urljoin(root, p))
    # current contents unchanged; retained history readable; expired raises
    assert _rows(read_table(spark, root)) == before
    assert len(_rows(read_table(spark, root, snapshot_id=2))) == 20
    with pytest.raises(SnapshotError):
        read_table(spark, root, snapshot_id=1)
    assert [s["snapshot_id"] for s in snapshots(spark, root)] == [2, 3]


def test_expire_keeps_files_still_referenced_downstream(spark, root):
    """A file added by an expired append but carried as `existing` by a
    retained snapshot is live and must survive the GC."""
    create_table(spark, root, _docs(spark, 0, 10, parts=2))   # s1
    append(spark, root, _docs(spark, 10, 20, parts=2))        # s2 carries s1
    append(spark, root, _docs(spark, 20, 30, parts=2))        # s3 carries both
    s1_paths = _live_disk_paths(spark, root, 1)

    stats = expire_snapshots(spark, root, keep_last=1)
    assert stats["expired"] == [1, 2]
    assert stats["n_deleted_files"] == 0  # everything still referenced
    for p in s1_paths:
        assert fsutil.exists(spark, fsutil.urljoin(root, p))
    assert _rows(read_table(spark, root)) == [
        (i, f"content-{i}") for i in range(30)
    ]


def test_expire_noop_and_validation(spark, root):
    create_table(spark, root, _docs(spark, 0, 5))
    append(spark, root, _docs(spark, 5, 10))
    assert expire_snapshots(spark, root, keep_last=5)["expired"] == []
    with pytest.raises(ValueError):
        expire_snapshots(spark, root, keep_last=0)


def test_expire_then_compact_then_expire_lifecycle(spark, root):
    """The steady-state maintenance loop: append debt -> compact ->
    expire the pre-compaction history -> only the compacted files
    remain on disk, contents bit-equal throughout."""
    create_table(spark, root, _docs(spark, 0, 30, parts=3))
    append(spark, root, _docs(spark, 30, 60, parts=3))
    want = [(i, f"content-{i}") for i in range(60)]

    snap, stats = compact_table(spark, root, target_bytes=1 << 30)
    assert stats["compacted"]
    out = expire_snapshots(spark, root, keep_last=1)
    assert out["expired"] == [1, 2]
    assert out["n_deleted_files"] == stats["n_rewritten"]  # all pre-compact files freed
    assert _rows(read_table(spark, root)) == want
    census = table_file_census(spark, root)
    assert census["n_files"] == stats["n_output_files"]
    with pytest.raises(SnapshotError):
        table_file_census(spark, root, snapshot_id=1)


def test_maintenance_cli_compact_and_expire(spark, tmp_path):
    """The spark-submit seam: one invocation compacts, expires the
    pre-compaction history, and prints a JSON summary (subprocess)."""
    import json
    import os
    import subprocess
    import sys

    root = str(tmp_path / "cli_tbl")
    create_table(spark, root, _docs(spark, 0, 20, parts=4))
    append(spark, root, _docs(spark, 20, 40, parts=4))

    proc = subprocess.run(
        [
            sys.executable, "-m",
            "hyrise_generalized_dedup_spark.sources.maintenance",
            root,
            "--compact-target", str(1 << 30),
            "--expire-keep", "1",
            "--census",
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["compact"]["compacted"] and out["compact"]["n_rewritten"] == 8
    assert out["expire"]["expired"] == [1, 2]
    assert out["census"]["n_files"] == out["compact"]["n_output_files"]
    assert _rows(read_table(spark, root)) == [
        (i, f"content-{i}") for i in range(40)
    ]


def test_compact_with_zorder_rewrite_prunes_both_dims(spark, root):
    """compact_table(zorder_cols=...) — Iceberg's zorder rewrite
    strategy: the compacted files' per-file stats are tight on BOTH
    listed dimensions, where binpack coalesce only inherits whatever
    order the appends had."""
    n = 64
    grid = spark.range(n * n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    create_table(spark, root, grid.repartition(8))
    # zorder mode is rewrite-all (re-clustering), and the tiny byte
    # target yields enough output files (>=16) that each Morton slab
    # must box a small region
    snap, stats = compact_table(
        spark, root, target_bytes=1 << 10, zorder_cols=["x", "y"]
    )
    assert stats["compacted"] and stats["n_rewritten"] == 8
    assert stats["n_output_files"] >= 16
    # content is bit-equal
    got = sorted((r.doc_id, r.x, r.y) for r in read_table(spark, root).collect())
    assert got == [(i, i % n, i // n) for i in range(n * n)]
    # Pruning quality is an AGGREGATE property: a z-interval that
    # straddles a quadrant boundary can box a wide slab (inherent to the
    # curve), so assert the mean per-file bounding-box area — it must be
    # a small fraction of the grid, where the random-order binpack
    # baseline's files each box ~the whole grid.
    def mean_bbox_area(df):
        bounds = (
            df.groupBy(F.input_file_name().alias("f"))
            .agg(F.min("x").alias("lox"), F.max("x").alias("hix"),
                 F.min("y").alias("loy"), F.max("y").alias("hiy"))
            .collect()
        )
        return bounds, sum(
            (r.hix - r.lox + 1) * (r.hiy - r.loy + 1) for r in bounds
        ) / len(bounds)

    zb, z_area = mean_bbox_area(read_table(spark, root))
    assert len(zb) == stats["n_output_files"]
    _, bin_area = mean_bbox_area(read_table(spark, root, snapshot_id=1))
    assert z_area <= (n * n) / 4, (z_area, n * n)
    assert z_area < bin_area / 2, (z_area, bin_area)


def test_remove_orphan_files_sweeps_dead_commit_debris(spark, root, tmp_path):
    """A commit that died after writing data but before flipping the
    hint leaves an invisible data dir + manifest; the orphan sweep must
    remove exactly that debris and nothing live."""
    from hyrise_generalized_dedup_spark.sources.maintenance import (
        remove_orphan_files,
    )
    from hyrise_generalized_dedup_spark import fsutil

    create_table(spark, root, _docs(spark, 0, 20, parts=2))
    append(spark, root, _docs(spark, 20, 30, parts=2))
    before = _rows(read_table(spark, root))

    # simulate the dead commit: data files + manifest, NO hint flip
    dead_dir = f"{root}/data/s9"
    _docs(spark, 100, 110, parts=2).write.parquet(dead_dir)
    fsutil.write_text(
        spark, f"{root}/metadata/snap-9.json",
        '{"snapshot_id": 9, "operation": "append", "files": []}',
    )

    dry = remove_orphan_files(spark, root, dry_run=True)
    assert dry["n_deleted_files"] == 2 and dry["n_deleted_manifests"] == 1
    assert fsutil.exists(spark, f"{root}/metadata/snap-9.json")  # dry run

    out = remove_orphan_files(spark, root)
    assert out["n_deleted_files"] == 2 and out["freed_bytes"] > 0
    assert out["n_deleted_manifests"] == 1
    assert out["n_live_files"] == 4
    assert not fsutil.exists(spark, dead_dir)  # whole dead dir swept
    assert not fsutil.exists(spark, f"{root}/metadata/snap-9.json")
    # table untouched: contents and time travel identical
    assert _rows(read_table(spark, root)) == before
    assert len(_rows(read_table(spark, root, snapshot_id=1))) == 20

    # steady state: a second sweep finds nothing
    again = remove_orphan_files(spark, root)
    assert again["n_deleted_files"] == 0 and again["n_deleted_manifests"] == 0


def test_maintenance_cli_rollback_then_expire(spark, tmp_path):
    """--rollback runs before expiry in one invocation: the table serves
    the rolled-back state and the sweep keeps it (current is pinned)."""
    import json
    import os
    import subprocess
    import sys

    root = str(tmp_path / "rb_tbl")
    create_table(spark, root, _docs(spark, 0, 10))
    append(spark, root, _docs(spark, 10, 20))
    append(spark, root, _docs(spark, 20, 30))

    proc = subprocess.run(
        [
            sys.executable, "-m",
            "hyrise_generalized_dedup_spark.sources.maintenance",
            root,
            "--rollback", "1",
            "--expire-keep", "1",
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["rollback"]["snapshot_id"] == 1
    # keep_last=1 keeps snapshot 3 (newest); current snapshot 1 is pinned
    assert out["expire"]["expired"] == [2]
    assert _rows(read_table(spark, root)) == [
        (i, f"content-{i}") for i in range(10)
    ]
