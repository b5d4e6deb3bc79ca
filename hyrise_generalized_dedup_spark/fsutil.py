"""Filesystem access routed through the Hadoop FileSystem API.

Checkpoint `_DONE` markers, resume checks, and per-stage metrics must
work wherever the pipeline's ``out_dir`` lives — driver-local POSIX,
``file://``, ``hdfs://``, ``s3a://`` — because the north rule's
"resumable from checkpoint" applies on the multi-executor cluster where
the output is an object store, not the driver's disk. Parquet reads and
writes already go through Hadoop; this module gives the driver-side
marker/metrics layer the same reach (no raw ``os.path`` / ``open()``).

Reference analog: the reference's import/export layer resolves paths
through one filesystem seam (`src/lib/import_export/`), not scattered
POSIX calls.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def urljoin(*parts: str) -> str:
    """Join path components without destroying a URI scheme.

    ``os.path.join`` is wrong for ``s3a://bucket/k`` (and on Windows);
    Hadoop paths are always ``/``-separated.
    """
    out = parts[0].rstrip("/")
    for p in parts[1:]:
        out += "/" + p.strip("/")
    return out


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a small text file (marker, metrics JSON)."""
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        # IOUtils drains the stream JVM-side and hands the bytes back in
        # one py4j transfer (mutating a passed-in buffer would not
        # propagate back across py4j).
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.delete(p, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic-on-HDFS directory rename (a copy on object stores); the
    incremental updater's checkpoint swap primitive."""
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    return bool(fs.rename(s, d))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def list_dirs(spark: SparkSession, path: str) -> list[str]:
    """Names of subdirectories directly under ``path``, sorted; [] when
    the directory is absent (checkpoint-GC enumerates config hashes)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return sorted(
        status.getPath().getName()
        for status in fs.listStatus(p)
        if status.isDirectory()
    )


def list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(name, bytes) for plain files directly under ``path``, sorted by
    name; [] when the directory is absent. One RPC-batched listStatus —
    the metrics layer's whole-stage histogram costs a single listing,
    not a Spark job (see dedup/metrics.py)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        if status.isFile():
            out.append((status.getPath().getName(), int(status.getLen())))
    return sorted(out)
