"""Snapshot-versioned table source with Iceberg-style semantics.

The north rule targets "Iceberg tables of source-code repositories":
a table whose data lives as immutable parquet files and whose *state*
(which files are live) is a chain of snapshot manifests, so readers get

- **time travel** — read the table as of any committed snapshot,
- **incremental scans** — read ONLY the rows appended between two
  snapshots (the feed for incremental dedup: no diff join, no shuffle,
  the manifest itself tells you which files are new), and
- **atomic commits** — a half-written snapshot is invisible because the
  version hint flips last.

This module implements those semantics (the part the engine needs) over
JSON manifests rather than the Iceberg binary Avro format — the
container has no Avro codec, and the *contract* (manifest-listed
immutable data files + last-wins version pointer, per the public Apache
Iceberg table spec, https://iceberg.apache.org/spec/) is what the
pipeline depends on, not the wire encoding. Data files are ordinary
Spark parquet, so column pruning / predicate pushdown / partition
coalescing are exactly what `spark.read.parquet` gives — the manifest
layer only decides WHICH files to hand to the scan.

All metadata I/O goes through :mod:`..fsutil` (Hadoop FileSystem API),
so a table root may be POSIX, ``file://``, ``hdfs://``, or ``s3a://`` —
same reach as the checkpoint layer. Reference analog: the reference
resolves all table storage through one import/export seam
(`src/lib/import_export/`, `src/lib/storage/table.hpp`); this is that
seam for versioned corpora.

Layout under ``<root>/``::

    metadata/version-hint.text     current metadata version N (written last)
    metadata/v{N}.metadata.json    snapshot log + current snapshot id
    metadata/snap-{id}.json        manifest: live data files at that snapshot
    data/s{snapshot_id}/part-*.parquet   immutable data written by that commit

Snapshot ids are sequential (1, 2, ...) and commits are deterministic —
no wall clock, no UUIDs — so goldens and incremental bit-equality tests
can pin exact table states. Single-writer discipline is assumed (the
pipeline driver is the only committer), matching how the dedup
checkpoint tree is owned.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .. import fsutil

_HINT = "metadata/version-hint.text"


class SnapshotError(ValueError):
    """Unknown snapshot id / invalid incremental range / no table."""


# ---------------------------------------------------------------------------
# metadata plumbing


def _meta_path(root: str, version: int) -> str:
    return fsutil.urljoin(root, f"metadata/v{version}.metadata.json")


def _manifest_path(root: str, snapshot_id: int) -> str:
    return fsutil.urljoin(root, f"metadata/snap-{snapshot_id}.json")


def _current_version(spark: SparkSession, root: str) -> int:
    hint = fsutil.urljoin(root, _HINT)
    if not fsutil.exists(spark, hint):
        raise SnapshotError(f"no snapshot table at {root} (missing {_HINT})")
    return int(fsutil.read_text(spark, hint).strip())


def _read_metadata(spark: SparkSession, root: str) -> dict:
    return json.loads(
        fsutil.read_text(spark, _meta_path(root, _current_version(spark, root)))
    )


def _read_manifest(spark: SparkSession, root: str, snapshot_id: int) -> dict:
    path = _manifest_path(root, snapshot_id)
    if not fsutil.exists(spark, path):
        raise SnapshotError(f"snapshot {snapshot_id} has no manifest at {path}")
    return json.loads(fsutil.read_text(spark, path))


def _merge_schema(prior: dict | None, df_schema) -> dict:
    """Additive schema evolution (the Iceberg spec's add-column case):
    the table schema is the prior columns, in order, plus any new
    columns ``df`` introduces, appended. Dropping columns is not a write
    side effect (a committed column stays in the table schema; writers
    that omit it produce NULLs on read), and changing a committed
    column's type is refused — the spec's promotion lattice is out of
    scope, and a silent type flip would corrupt every older file."""
    new_json = json.loads(df_schema.json())
    if prior is None:
        return new_json
    prior_by_name = {f["name"]: f for f in prior["fields"]}
    merged = list(prior["fields"])
    for f in new_json["fields"]:
        old = prior_by_name.get(f["name"])
        if old is None:
            merged.append(f)
        elif old["type"] != f["type"]:
            raise SnapshotError(
                f"schema evolution cannot change column '{f['name']}' "
                f"from {old['type']} to {f['type']}"
            )
    return {**prior, "fields": merged}


def _commit(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    operation: str,
    prior_files: list[dict],
) -> int:
    """Write ``df`` as a new snapshot's data files and flip the hint.

    Commit order is the crash-safety argument: (1) parquet data,
    (2) snapshot manifest, (3) new metadata json, (4) version hint.
    A failure before (4) leaves the table readable at the prior
    version; data/metadata written by the dead commit are unreferenced
    garbage, never a corrupt state.
    """
    meta = (
        _read_metadata(spark, root)
        if fsutil.exists(spark, fsutil.urljoin(root, _HINT))
        else {"format_version": 1, "current_snapshot_id": 0, "snapshots": []}
    )
    schema = _merge_schema(meta.get("current_schema"), df.schema)
    # once live files were written under an older schema, readers of this
    # snapshot must schema-merge footers; an overwrite (no carried files)
    # resets the table to single-schema reads
    mixed = bool(prior_files) and (
        bool(meta.get("mixed_schema")) or schema != meta.get("current_schema")
    )
    snap_id = int(meta["current_snapshot_id"]) + 1
    data_dir = fsutil.urljoin(root, f"data/s{snap_id}")
    df.write.mode("error").parquet(data_dir)
    added = [
        {
            "path": f"data/s{snap_id}/{name}",
            "status": "added",
            "added_snapshot_id": snap_id,
            "bytes": size,
        }
        for name, size in fsutil.list_files(spark, data_dir)
        if name.endswith(".parquet")
    ]
    existing = [
        {**f, "status": "existing"} for f in prior_files
    ]
    manifest = {
        "snapshot_id": snap_id,
        "operation": operation,
        "files": existing + added,
        "schema": schema,
        "mixed_schema": mixed,
    }
    fsutil.write_text(
        spark, _manifest_path(root, snap_id), json.dumps(manifest, indent=1)
    )
    meta["current_snapshot_id"] = snap_id
    meta["current_schema"] = schema
    meta["mixed_schema"] = mixed
    meta["snapshots"] = list(meta["snapshots"]) + [
        {"snapshot_id": snap_id, "operation": operation, "n_files_added": len(added)}
    ]
    version = len(meta["snapshots"])
    fsutil.write_text(spark, _meta_path(root, version), json.dumps(meta, indent=1))
    fsutil.write_text(spark, fsutil.urljoin(root, _HINT), str(version))
    return snap_id


# ---------------------------------------------------------------------------
# public write API


def create_table(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Create a snapshot table at ``root`` from ``df`` (snapshot 1)."""
    if fsutil.exists(spark, fsutil.urljoin(root, _HINT)):
        raise SnapshotError(f"table already exists at {root}")
    return _commit(spark, root, df, "append", prior_files=[])


def append(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Commit ``df`` as new data files; prior files stay live."""
    meta = _read_metadata(spark, root)
    prior = _read_manifest(spark, root, int(meta["current_snapshot_id"]))["files"]
    return _commit(spark, root, df, "append", prior_files=prior)


def overwrite(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Commit ``df`` as the table's full new contents (prior files
    dropped from the manifest; their bytes stay for time travel)."""
    _read_metadata(spark, root)  # must exist
    return _commit(spark, root, df, "overwrite", prior_files=[])


# ---------------------------------------------------------------------------
# public read API


def snapshots(spark: SparkSession, root: str) -> list[dict]:
    """The committed snapshot log (id, operation, files added)."""
    return list(_read_metadata(spark, root)["snapshots"])


def current_snapshot_id(spark: SparkSession, root: str) -> int:
    return int(_read_metadata(spark, root)["current_snapshot_id"])


def _live_paths(spark: SparkSession, root: str, snapshot_id: int) -> list[str]:
    manifest = _read_manifest(spark, root, snapshot_id)
    return [fsutil.urljoin(root, f["path"]) for f in manifest["files"]]


def _manifest_scan(spark: SparkSession, root: str, manifest: dict,
                   paths: list[str] | None = None) -> DataFrame:
    """Scan a manifest's files under its recorded schema.

    Plain single-schema tables stay a bare `spark.read.parquet(*files)`
    (pushdown / pruning / split parallelism all Catalyst's). A manifest
    whose live files span schema versions (``mixed_schema``) reads with
    ``mergeSchema`` — the footer-merge cost is paid ONLY on evolved
    tables, and an overwrite resets it — and every read is projected to
    the snapshot's recorded column list, so columns a file predates come
    back as typed NULLs in stable order."""
    from pyspark.sql.types import StructType

    if paths is None:
        paths = [fsutil.urljoin(root, f["path"]) for f in manifest["files"]]
    reader = spark.read
    if manifest.get("mixed_schema"):
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*paths)
    schema_json = manifest.get("schema")
    if schema_json is not None:
        fields = StructType.fromJson(schema_json)
        df = df.select(*[
            F.col(f.name) if f.name in df.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in fields
        ])
    return df


def table_schema(spark: SparkSession, root: str,
                 snapshot_id: int | None = None):
    """The recorded table schema as of a snapshot (StructType), or None
    for tables written before schema tracking."""
    from pyspark.sql.types import StructType

    meta = _read_metadata(spark, root)
    snap = int(meta["current_snapshot_id"]) if snapshot_id is None else snapshot_id
    schema_json = _read_manifest(spark, root, snap).get("schema")
    return None if schema_json is None else StructType.fromJson(schema_json)


def read_table(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """The table's rows as of ``snapshot_id`` (default: current), under
    that snapshot's recorded schema (see :func:`_manifest_scan`)."""
    meta = _read_metadata(spark, root)
    snap = int(meta["current_snapshot_id"]) if snapshot_id is None else snapshot_id
    known = {s["snapshot_id"] for s in meta["snapshots"]}
    if snap not in known:
        raise SnapshotError(f"unknown snapshot {snap}; committed: {sorted(known)}")
    return _manifest_scan(spark, root, _read_manifest(spark, root, snap))


def incremental_scan(
    spark: SparkSession,
    root: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Rows appended in snapshots ``(from, to]`` — file-level, no diff.

    This is the scale path for incremental dedup at 10^12 files: the
    manifest names exactly the files added since the last absorbed
    snapshot, so the "what's new" question costs a driver-side JSON
    read, not a corpus-wide anti-join. Append-only ranges only: if any
    snapshot in the range is an overwrite the file-level diff no longer
    equals the row-level diff, and we refuse (the public Iceberg
    incremental append scan has the same restriction).
    """
    meta = _read_metadata(spark, root)
    to_snap = int(meta["current_snapshot_id"]) if to_snapshot_id is None else to_snapshot_id
    log = {s["snapshot_id"]: s for s in meta["snapshots"]}
    if from_snapshot_id not in log or to_snap not in log:
        raise SnapshotError(
            f"incremental range ({from_snapshot_id}, {to_snap}] not in log "
            f"{sorted(log)}"
        )
    if to_snap < from_snapshot_id:
        raise SnapshotError("to_snapshot must be >= from_snapshot")
    in_range = [s for i, s in log.items() if from_snapshot_id < i <= to_snap]
    bad = [s["snapshot_id"] for s in in_range if s["operation"] != "append"]
    if bad:
        raise SnapshotError(
            f"incremental scan crosses non-append snapshots {bad}; "
            "read_table both ends and diff instead"
        )
    manifest = _read_manifest(spark, root, to_snap)
    paths = [
        fsutil.urljoin(root, f["path"])
        for f in manifest["files"]
        if from_snapshot_id < int(f["added_snapshot_id"]) <= to_snap
    ]
    if not paths:
        return read_table(spark, root, to_snap).limit(0)
    return _manifest_scan(spark, root, manifest, paths=paths)


def snapshot_diff(
    spark: SparkSession,
    root: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Row-level diff between two snapshots: one row per key present in
    either side, tagged ``change`` in {added, removed, modified,
    unchanged}. This is the overwrite-safe complement to
    ``incremental_scan`` (which refuses non-append ranges): any commit
    sequence diffs correctly because both sides are plain snapshot reads.

    Shape at scale: two manifest-routed parquet scans + one full outer
    join on the key — Catalyst prunes each scan to key columns plus the
    change-hash input, and the join is the unavoidable single shuffle of
    any row-level diff. Modification detection hashes all non-key
    columns into one sha256 per side, so wide rows never carry past the
    scan stage."""
    old = read_table(spark, root, from_snapshot_id)
    new = read_table(spark, root, to_snapshot_id)

    def hashed(df: DataFrame, tag: str) -> DataFrame:
        value_cols = sorted(c for c in df.columns if c not in key_cols)
        # injective row encoding: each column hashes independently to a
        # fixed-width hex token (NULL -> the non-hex marker 'null'), so
        # no value can smuggle a separator or imitate another column's
        # boundary — a concat_ws over raw values would collide on
        # separator-bearing content
        digest = F.sha2(
            F.concat_ws(
                "|",
                *[
                    F.coalesce(
                        F.sha2(F.col(c).cast("string"), 256), F.lit("null")
                    )
                    for c in value_cols
                ],
            ),
            256,
        )
        return df.select(*key_cols, digest.alias(f"{tag}_sha"))

    joined = hashed(old, "old").join(
        hashed(new, "new"), on=list(key_cols), how="full_outer"
    )
    return joined.select(
        *key_cols,
        F.when(F.col("old_sha").isNull(), F.lit("added"))
        .when(F.col("new_sha").isNull(), F.lit("removed"))
        .when(F.col("old_sha") != F.col("new_sha"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )


# ---------------------------------------------------------------------------
# pipeline CLI seam


def resolve_input(spark: SparkSession, spec: str) -> DataFrame:
    """Parse the pipeline's ``--input iceberg:<root>[@N]`` form.

    ``iceberg:/tables/code`` reads the current snapshot;
    ``iceberg:/tables/code@3`` time-travels to snapshot 3.
    """
    body = spec[len("iceberg:"):]
    if "@" in body:
        root, _, snap = body.rpartition("@")
        return read_table(spark, root, int(snap))
    return read_table(spark, body)
