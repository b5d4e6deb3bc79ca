"""Snapshot-table maintenance: expiry GC and small-file compaction.

A 10^12-file corpus under continuous incremental commits accumulates two
kinds of debt the public Iceberg spec names directly:

- **snapshot debt** — every commit keeps its predecessors readable for
  time travel, so data files superseded long ago still occupy storage
  (`expireSnapshots` in Iceberg's maintenance docs);
- **small-file debt** — frequent small appends write many sub-target
  parquet files, and scan task count (and driver planning cost) grows
  with file count, not byte count (`rewriteDataFiles` / binpack).

Both are implemented here over the JSON-manifest snapshot tables of
:mod:`.icetable`, with the same crash-safety discipline as the commit
path: *metadata flips first, garbage is deleted last*, so an interrupted
maintenance run leaves a fully readable table plus unreferenced files,
never a broken one.

Reference analog: the reference engine vacuums MVCC chunks after commit
watermarks pass (`src/lib/concurrency/transaction_manager.hpp`) — this
is that lifecycle role for the snapshot layer.

Scale notes: both operations are metadata-driven — the file lists come
from driver-side manifests (Iceberg's own design point: maintenance
plans over metadata, never a corpus scan). Compaction's single data job
reads ONLY the sub-target files and `coalesce`s them (a no-shuffle
merge of scan partitions); files already at target size are carried by
reference into the new manifest and never re-read.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession

from .. import fsutil
from . import icetable
from .icetable import SnapshotError


def expire_snapshots(spark: SparkSession, root: str, keep_last: int = 2) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and delete data
    files no longer referenced by any retained snapshot.

    Order of operations (the crash-safety argument):

    1. write a new metadata version whose snapshot log holds only the
       retained snapshots, and flip the version hint — from here the
       expired snapshots are unreadable and everything else is garbage;
    2. delete the expired manifests and any data file that appears in an
       expired manifest but in no retained one.

    A file added by an expired snapshot but still carried as
    ``existing`` by a retained manifest is live and survives. Returns
    ``{expired, n_deleted_files, freed_bytes, n_live_files}``.
    """
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    meta = icetable._read_metadata(spark, root)
    log = list(meta["snapshots"])
    if keep_last >= len(log):
        return {"expired": [], "n_deleted_files": 0, "freed_bytes": 0,
                "n_live_files": None}
    # tagged snapshots (release refs) are pinned: retention never expires
    # them — Iceberg's expireSnapshots has the same tag-protection rule.
    # The CURRENT snapshot is pinned too: after a rollback it is older
    # than the newest log entries, and "keep the last K" must never
    # delete the state the table is serving.
    tagged = {int(v) for v in (meta.get("refs") or {}).values()}
    tagged.add(int(meta["current_snapshot_id"]))
    recent = {int(s["snapshot_id"]) for s in log[-keep_last:]}
    retained = [s for s in log if int(s["snapshot_id"]) in (recent | tagged)]
    expired = [s for s in log if int(s["snapshot_id"]) not in (recent | tagged)]
    if not expired:
        return {"expired": [], "n_deleted_files": 0, "freed_bytes": 0,
                "n_live_files": None}

    referenced: dict[str, dict] = {}
    for s in retained:
        man = icetable._read_manifest(spark, root, int(s["snapshot_id"]))
        for f in man["files"]:
            referenced[f["path"]] = f
    candidates: dict[str, dict] = {}
    for s in expired:
        man = icetable._read_manifest(spark, root, int(s["snapshot_id"]))
        for f in man["files"]:
            candidates[f["path"]] = f
    doomed = {p: f for p, f in candidates.items() if p not in referenced}

    # (1) metadata first
    meta["snapshots"] = retained
    version = icetable._current_version(spark, root) + 1
    fsutil.write_text(
        spark, icetable._meta_path(root, version), json.dumps(meta, indent=1)
    )
    fsutil.write_text(spark, fsutil.urljoin(root, icetable._HINT), str(version))

    # (2) garbage last
    for s in expired:
        fsutil.delete(spark, icetable._manifest_path(root, int(s["snapshot_id"])))
    freed = 0
    for p, f in doomed.items():
        if fsutil.delete(spark, fsutil.urljoin(root, p), recursive=False):
            freed += int(f.get("bytes", 0))
    return {
        "expired": [int(s["snapshot_id"]) for s in expired],
        "n_deleted_files": len(doomed),
        "freed_bytes": freed,
        "n_live_files": len(referenced),
    }


def compact_table(
    spark: SparkSession,
    root: str,
    target_bytes: int,
    small_frac: float = 0.75,
    zorder_cols: list[str] | None = None,
) -> tuple[int, dict]:
    """Rewrite the current snapshot's sub-target data files into
    ~``target_bytes`` files and commit the result as a ``replace``
    snapshot (row content identical; time travel to every prior snapshot
    intact). Files already >= ``small_frac * target_bytes`` are carried
    into the new manifest by reference — never re-read, never rewritten.

    Default (binpack) rewrite is ONE job: a manifest-routed parquet read
    of only the small files, then ``coalesce(ceil(small_bytes /
    target_bytes))`` — a shuffle-free merge of scan partitions
    (Iceberg's binpack strategy). With ``zorder_cols`` the rewrite
    instead RE-CLUSTERS the table: every live file is rewritten,
    range-partitioned on the Morton key of those columns
    (:func:`..functions.zorder.zorder_layout` — Iceberg's sort/zorder
    rewrite, likewise rewrite-all: clustering is a whole-table property,
    so size-based file selection doesn't apply). One shuffle, bought
    deliberately so the compacted files' min/max stats prune on EVERY
    listed dimension afterwards. Returns ``(snapshot_id, stats)``; a
    binpack run over fewer than two sub-target files is already compact
    and commits nothing.
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    meta = icetable._read_metadata(spark, root)
    cur = int(meta["current_snapshot_id"])
    files = icetable._read_manifest(spark, root, cur)["files"]
    if zorder_cols:
        small, keep = list(files), []
    else:
        cutoff = small_frac * target_bytes
        small = [f for f in files if int(f["bytes"]) < cutoff]
        keep = [f for f in files if int(f["bytes"]) >= cutoff]
    if len(small) < 2:
        return cur, {
            "compacted": False, "n_input_files": len(files),
            "n_rewritten": 0, "n_kept": len(files), "n_output_files": 0,
            "bytes_rewritten": 0,
        }
    small_bytes = sum(int(f["bytes"]) for f in small)
    n_out = max(1, math.ceil(small_bytes / target_bytes))
    # schema-aware scan: files written before a column was added read as
    # typed NULLs, so the rewrite also MATERIALIZES schema evolution —
    # compacted files all carry the current table schema
    manifest = icetable._read_manifest(spark, root, cur)
    merged: DataFrame = icetable._manifest_scan(
        spark, root, manifest,
        paths=[fsutil.urljoin(root, f["path"]) for f in small],
    )
    if zorder_cols:
        from ..functions.zorder import zorder_layout

        merged = zorder_layout(merged, zorder_cols, n_partitions=n_out)
    else:
        merged = merged.coalesce(n_out)
    snap = icetable._commit(spark, root, merged, "replace", prior_files=keep)
    added = [
        f for f in icetable._read_manifest(spark, root, snap)["files"]
        if f["status"] == "added"
    ]
    return snap, {
        "compacted": True, "n_input_files": len(files),
        "n_rewritten": len(small), "n_kept": len(keep),
        "n_output_files": len(added), "bytes_rewritten": small_bytes,
    }


def table_file_census(spark: SparkSession, root: str,
                      snapshot_id: int | None = None) -> dict:
    """Driver-side file-size census of a snapshot (count, bytes, min/max
    file size) — the signal a maintenance scheduler watches to decide
    when :func:`compact_table` pays for itself."""
    meta = icetable._read_metadata(spark, root)
    snap = int(meta["current_snapshot_id"]) if snapshot_id is None else snapshot_id
    known = {int(s["snapshot_id"]) for s in meta["snapshots"]}
    if snap not in known:
        raise SnapshotError(f"unknown snapshot {snap}; committed: {sorted(known)}")
    sizes = [int(f["bytes"]) for f in icetable._read_manifest(spark, root, snap)["files"]]
    return {
        "snapshot_id": snap,
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
    }


def main() -> None:
    """spark-submit seam: ``python -m ...sources.maintenance <root>
    [--expire-keep N] [--compact-target BYTES] [--census]`` — the same
    job a table-maintenance cron would submit. Compaction runs before
    expiry so a single invocation can retire the files it just
    rewrote."""
    import argparse

    ap = argparse.ArgumentParser(description="snapshot-table maintenance")
    ap.add_argument("root", help="snapshot table root (POSIX/file://hdfs://s3a://)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--compact-target", type=int, default=None,
                    help="rewrite sub-target data files into ~BYTES files")
    ap.add_argument("--zorder", default=None, metavar="COL,COL[,...]",
                    help="compact with a Z-order rewrite on these columns "
                         "instead of binpack coalesce")
    ap.add_argument("--expire-keep", type=int, default=None,
                    help="expire all but the newest N snapshots")
    ap.add_argument("--census", action="store_true",
                    help="print the current file-size census")
    ap.add_argument("--orphans", action="store_true",
                    help="delete data files no committed snapshot references")
    ap.add_argument("--rollback", default=None, metavar="ID|TAG",
                    help="make an earlier snapshot current again "
                         "(metadata-only; runs before compact/expire)")
    args = ap.parse_args()
    if (args.compact_target is None and args.expire_keep is None
            and not args.census and not args.orphans
            and args.rollback is None):
        ap.error("nothing to do: pass --rollback, --compact-target, "
                 "--expire-keep, --orphans, or --census")
    if args.zorder is not None and args.compact_target is None:
        ap.error("--zorder requires --compact-target")

    from ..session import get_spark

    spark = get_spark(app_name="gd-maintenance", master=args.master)
    out: dict = {"root": args.root}
    if args.rollback is not None:
        from .icetable import rollback_table

        to = int(args.rollback) if args.rollback.isdigit() else args.rollback
        out["rollback"] = {"snapshot_id": rollback_table(spark, args.root, to)}
    if args.compact_target is not None:
        zcols = args.zorder.split(",") if args.zorder else None
        snap, stats = compact_table(
            spark, args.root, args.compact_target, zorder_cols=zcols
        )
        out["compact"] = {"snapshot_id": snap, **stats}
    if args.expire_keep is not None:
        out["expire"] = expire_snapshots(spark, args.root, args.expire_keep)
    if args.orphans:
        out["orphans"] = remove_orphan_files(spark, args.root)
    if args.census:
        out["census"] = table_file_census(spark, args.root)
    print(json.dumps(out))




def remove_orphan_files(spark: SparkSession, root: str,
                        dry_run: bool = False) -> dict:
    """Delete data files on disk that no committed snapshot references —
    the debris of commits that died between writing parquet and flipping
    the version hint (the commit protocol makes such files invisible but
    not free). Also removes manifest jsons for snapshot ids absent from
    the current metadata log (a dead commit's manifest, written before
    its hint flip) and whole data/s{id} dirs left empty.

    Scale shape: pure metadata + listing work (one listStatus per
    snapshot data dir; manifests are driver JSON) — never a table scan.
    Safe by the same argument as expiry: the reachable-file set is
    computed from the CURRENT metadata log, which single-writer
    discipline freezes for the duration of the run. ``dry_run`` reports
    without deleting. Returns ``{n_deleted_files, freed_bytes,
    n_deleted_manifests, n_live_files}``."""
    meta = icetable._read_metadata(spark, root)
    live_ids = {int(s["snapshot_id"]) for s in meta["snapshots"]}
    referenced: set[str] = set()
    for sid in live_ids:
        man = icetable._read_manifest(spark, root, sid)
        referenced |= {f["path"] for f in man["files"]}

    doomed: list[tuple[str, int]] = []
    data_root = fsutil.urljoin(root, "data")
    for d in fsutil.list_dirs(spark, data_root):
        for name, size in fsutil.list_files(spark, fsutil.urljoin(data_root, d)):
            rel = f"data/{d}/{name}"
            # non-parquet write debris (_SUCCESS markers) in dead dirs is
            # swept with the dir below; live dirs keep theirs
            if name.endswith(".parquet") and rel not in referenced:
                doomed.append((rel, size))

    dead_manifests = []
    for name, _ in fsutil.list_files(spark, fsutil.urljoin(root, "metadata")):
        if name.startswith("snap-") and name.endswith(".json"):
            sid = int(name[len("snap-"):-len(".json")])
            if sid not in live_ids:
                dead_manifests.append(name)

    out = {
        "n_deleted_files": len(doomed),
        "freed_bytes": sum(s for _, s in doomed),
        "n_deleted_manifests": len(dead_manifests),
        "n_live_files": len(referenced),
    }
    if dry_run:
        return out
    for rel, _ in doomed:
        fsutil.delete(spark, fsutil.urljoin(root, rel), recursive=False)
    for name in dead_manifests:
        fsutil.delete(spark, fsutil.urljoin(root, "metadata", name), recursive=False)
    # sweep data dirs that no longer hold any referenced file (dead
    # commits' dirs, incl. their _SUCCESS markers)
    live_dirs = {p.split("/")[1] for p in referenced}
    for d in fsutil.list_dirs(spark, data_root):
        if d not in live_dirs:
            fsutil.delete(spark, fsutil.urljoin(data_root, d), recursive=True)
    return out


if __name__ == "__main__":
    main()
