"""Filesystem commit primitives shared by the table / rollup publish
protocols (table.KeyedTable._publish_snapshot, streaming.rollup).

The publish protocol stages a directory and renames it to its final
commit name, treating the rename as a compare-and-swap: "false" means a
concurrent writer won the name. One Hadoop quirk breaks that premise on
LocalFileSystem (and any POSIX-`mv`-semantics store): renaming a
directory onto an EXISTING directory moves the source INSIDE the target
and still returns true — the loser's commit would silently nest inside
the winner's, corrupting reads of that commit. `rename_commit` closes
the hole: pre-check, rename, then detect-and-undo the move-into case
(stage basenames are uuids, so the nested-name probe cannot collide
with real commit content). On stores with atomic directory rename
(HDFS) the extra probes are two cheap namenode calls; on object stores
the whole rename-commit protocol is already documented as
single-writer."""

from __future__ import annotations


def rename_commit(fs, hpath, stage: str, target: str) -> bool:
    """Publish ``stage`` as ``target`` with CAS semantics: True iff this
    call made ``target`` exist with exactly the staged content. Returns
    False (leaving ``stage`` in place for the caller to retry or clean
    up) when a concurrent writer holds the name."""
    if fs.exists(hpath(target)):
        return False
    if not fs.rename(hpath(stage), hpath(target)):
        return False
    base = stage.rstrip("/").rsplit("/", 1)[-1]
    nested = f"{target}/{base}"
    if fs.exists(hpath(nested)):
        # POSIX move-INTO: a concurrent writer created target between the
        # exists-probe and the rename. Undo our nested copy; the stage is
        # consumed, so report failure with nothing left to clean. Residual
        # window: a crash BETWEEN the rename and this delete leaves the
        # stage nested inside the winner's commit — readers heal that via
        # heal_nested_dirs on the listing path (commit dirs are flat by
        # protocol, so any directory member is crash garbage).
        fs.delete(hpath(nested), True)
        return False
    return True


def heal_nested_dirs(fs, hpath, commit_uri: str) -> None:
    """Delete DIRECTORY members of a published commit dir.

    Both commit protocols (KeyedTable snapshots, rollup commits) publish
    FLAT directories — parquet parts, _SUCCESS, provenance markers; never
    subdirectories. The one way a subdirectory appears is the
    rename_commit move-INTO undo dying between its rename and its delete
    (loser's staged uuid dir nested inside the winner's commit), which
    breaks subsequent parquet reads of that commit with conflicting
    directory structures. In-flight stages live under ``<path>__stage/``,
    a sibling tree — never inside a commit — so deleting directory
    members here can only remove crash garbage."""
    for st in fs.listStatus(hpath(commit_uri)):
        if st.isDirectory():
            fs.delete(st.getPath(), True)


def hadoop_fs(spark, path: str):
    """Resolve (FileSystem, Path-class) for ``path`` — the one shared
    getter behind every rename-commit call site (KeyedTable snapshots,
    DeltaLogTable versions, rollup commits). Resolving PER PATH matters on
    mixed deployments: the scheme (file://, hdfs://, s3a://) picks the
    FileSystem implementation, so a table on object storage and a
    checkpoint on HDFS get their own clients."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def write_small_file(fs, hpath, path: str, data: bytes) -> None:
    """Create/overwrite one small file through the table's FileSystem (same
    client the commit protocol uses, so scheme/permissions behavior
    matches the data files). Used for the schema-sidecar commits — the
    bytes are staged into a directory and published via rename_commit, so
    this write itself needs no atomicity."""
    out = fs.create(hpath(path), True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_small_file(fs, hpath, spark, path: str) -> bytes | None:
    """Read one small file fully, or None when missing. Corrupt/unreadable
    content raises at the caller's json/schema parse — callers treat that
    as 'no sidecar' and fall back to footer inference."""
    if not fs.exists(hpath(path)):
        return None
    stream = fs.open(hpath(path))
    try:
        return bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()


def read_parquet_if_present(spark, path: str):
    """Parquet read with the NARROW missing-vs-broken distinction used by
    every bootstrap-or-merge decision (KeyedTable.exists, the SCD2 fold):
    returns the DataFrame, or None iff the table is MISSING/EMPTY
    (PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA). Any other read failure
    (transient FS error, corrupt footer, permissions) RAISES — treating a
    blip as "missing" would let the caller's bootstrap-overwrite wipe the
    table down to one batch. One definition so a Spark upgrade that
    renames a condition is fixed in one place."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis so the probe happens HERE, not later
        return df
    except AnalysisException as e:
        if e.getCondition() in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            return None
        raise
