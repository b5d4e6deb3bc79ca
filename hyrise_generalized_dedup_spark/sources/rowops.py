"""Copy-on-write row-level operations on snapshot tables: MERGE upsert
and DELETE WHERE, the Iceberg v1 CoW semantics.

The scale design point is *touched-file minimality*: a row-level change
to a 10^12-file table must not rewrite the table. Both operations first
locate the files that actually CONTAIN affected rows (one scan whose
only output is a distinct file list — Catalyst prunes it to the key /
predicate columns), rewrite only those, and carry every untouched file
into the new manifest by reference — stats, bytes, and
added_snapshot_id intact, exactly like compaction's kept files. A merge
that touches 10 of a million files writes 10 files' worth of data plus
the inserts.

Commits are ordinary :mod:`.icetable` snapshots ("merge" / "delete"
operations), so time travel, snapshot diff, expiry GC, and schema
evolution all compose; `incremental_scan` refuses to cross them (file
diff != row diff), which is the correct public-Iceberg behavior for
non-append snapshots. Reference analog: the reference mutates via MVCC
Insert/Delete operators (`src/lib/operators/insert.cpp`,
`delete.cpp`) — this is that DML surface restated as immutable-snapshot
copy-on-write, the form a distributed corpus store needs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from .. import fsutil
from . import icetable
from .icetable import SnapshotError


def _basename(path: str) -> str:
    return path.rsplit("/", 1)[-1]


def _split_touched(
    spark: SparkSession, root: str, manifest: dict, touched_names: set[str]
) -> tuple[list[dict], list[str]]:
    """Partition a manifest's files into (untouched entries, touched paths)."""
    untouched, touched = [], []
    for f in manifest["files"]:
        if _basename(f["path"]) in touched_names:
            touched.append(fsutil.urljoin(root, f["path"]))
        else:
            untouched.append(f)
    return untouched, touched


def merge_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> tuple[int, dict]:
    """Upsert ``updates`` by key: rows whose key exists are replaced,
    new keys are inserted (MERGE ... WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT). Only files containing a matched key are rewritten.

    ``updates`` must be key-unique — the ambiguity Iceberg's MERGE
    rejects ("multiple rows match") is rejected here too, *before*
    anything is written.
    """
    keys = list(key_cols)
    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise SnapshotError(
            f"updates are not unique on {keys}: e.g. "
            f"{tuple(dup[0][k] for k in keys)}"
        )
    meta = icetable._read_metadata(spark, root)
    cur_snap = int(meta["current_snapshot_id"])
    manifest = icetable._read_manifest(spark, root, cur_snap)
    cur = icetable._manifest_scan(spark, root, manifest)

    key_set = updates.select(*keys).distinct()
    touched_names = {
        _basename(r["__f"])
        for r in cur.withColumn("__f", F.input_file_name())
        .join(key_set, on=keys, how="left_semi")
        .select("__f").distinct().collect()
    }
    untouched, touched_paths = _split_touched(spark, root, manifest, touched_names)
    if touched_paths:
        survivors = icetable._manifest_scan(
            spark, root, manifest, paths=touched_paths
        ).join(key_set, on=keys, how="left_anti")
        new_data = survivors.unionByName(updates, allowMissingColumns=True)
    else:
        new_data = updates
    snap = icetable._commit(spark, root, new_data, "merge", prior_files=untouched)
    return snap, {
        "n_files_rewritten": len(touched_paths),
        "n_files_untouched": len(untouched),
    }


def delete_rows(
    spark: SparkSession,
    root: str,
    condition: Column | str,
) -> tuple[int, dict]:
    """DELETE WHERE ``condition`` (a Column or a SQL boolean string).
    Rows where the condition is TRUE are removed; NULL means "not
    matched" and the row survives (the SQL DELETE semantics). Only files
    containing at least one matching row are rewritten."""
    pred = F.expr(condition) if isinstance(condition, str) else condition
    hit = F.coalesce(pred, F.lit(False))
    meta = icetable._read_metadata(spark, root)
    cur_snap = int(meta["current_snapshot_id"])
    manifest = icetable._read_manifest(spark, root, cur_snap)
    cur = icetable._manifest_scan(spark, root, manifest)

    touched_names = {
        _basename(r["__f"])
        for r in cur.withColumn("__f", F.input_file_name())
        .filter(hit).select("__f").distinct().collect()
    }
    if not touched_names:
        return cur_snap, {"n_files_rewritten": 0,
                          "n_files_untouched": len(manifest["files"])}
    untouched, touched_paths = _split_touched(spark, root, manifest, touched_names)
    survivors = icetable._manifest_scan(
        spark, root, manifest, paths=touched_paths
    ).filter(~hit)
    snap = icetable._commit(spark, root, survivors, "delete", prior_files=untouched)
    return snap, {
        "n_files_rewritten": len(touched_paths),
        "n_files_untouched": len(untouched),
    }
