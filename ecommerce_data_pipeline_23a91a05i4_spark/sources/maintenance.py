"""Lakehouse table maintenance: small-file compaction and
dynamic-partition incremental refresh.

Neither exists in the reference — Postgres has VACUUM and in-place
UPDATE, so it never meets the two file-layout failure modes a parquet
lakehouse accumulates at scale:

1. **Small files.**  Every micro-batch / incremental append writes its
   own files; after months a partition holds thousands of KB-sized
   parquet files and scan cost is dominated by open/footer overhead,
   not bytes.  `compact_parquet` rewrites a directory to
   size-targeted files and swaps atomically.

2. **Full-refresh writes on partitioned tables.**  `mode("overwrite")`
   on a partitioned table truncates EVERY partition even when the new
   data touches one month (the reference's truncate-and-reload S5,
   acceptable at 40k rows, catastrophic at 100 TB).
   `overwrite_dynamic_partitions` flips Spark's
   partitionOverwriteMode=dynamic for the write, replacing only the
   partitions present in the incoming DataFrame.
"""

from __future__ import annotations

import posixpath
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .fs import filesystem_for


def parquet_data_files(path: str | Path) -> list[Path]:
    return [
        p
        for p in Path(path).rglob("*.parquet")
        if not p.name.startswith((".", "_"))
    ]


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fs=None,
) -> dict:
    """Rewrite a parquet directory into ~target_file_bytes files.

    File count is sized from the CURRENT on-disk bytes (compressed), so
    the rewrite preserves compression ratio assumptions; repartition (not
    coalesce) is used so the rewrite also rebalances skewed input files.
    The swap is write-aside + rename — readers see either the old layout
    or the new one, never a mix; the directory is replaced only after
    the new write fully commits (Spark's _SUCCESS protocol).  All file
    verbs go through ``fs`` (sources/fs.py: POSIX or Hadoop FileSystem),
    so the same compaction runs on hdfs:// and s3a:// tables.

    Returns {files_before, files_after, bytes}."""
    if fs is None:
        fs = filesystem_for(spark, path)
    parent = posixpath.dirname(str(path).rstrip("/"))
    files_before, total = fs.parquet_stats(path)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(str(path))
    tmp = posixpath.join(parent, f".compact-{uuid.uuid4().hex}")
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    old = posixpath.join(parent, f".old-{uuid.uuid4().hex}")
    fs.rename(str(path), old)
    fs.rename(tmp, str(path))
    fs.delete(old)
    files_after, _ = fs.parquet_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total,
    }


# --------------------------------------------- atomic multi-table publish

CURRENT_POINTER = "_CURRENT"


def publish_tables(
    tables: dict[str, DataFrame], root: str | Path, fs=None
) -> str:
    """Cross-table atomic publish: stage-then-pointer-swap.

    The reference loads the warehouse under one Postgres transaction
    (ingest_to_staging.py autocommit=False — SURVEY §2.12 X6); plain
    per-table parquet overwrites are atomic per TABLE but a reader can
    observe table A from the new load with table B from the old one.
    This primitive restores cross-table atomicity with the standard
    lakehouse snapshot pattern (the minimal form of what Delta/Iceberg
    commit logs do; for a SINGLE table with versioned history, appends,
    and MERGE, sources/txtable.py is the full manifest-log format):

    1. every table is written under ``root/v-<uuid>/<name>`` (a staging
       version directory readers never resolve on their own),
    2. a manifest records the table list,
    3. the ``_CURRENT`` pointer file is atomically replaced (POSIX
       same-directory rename) to name the new version directory.

    Readers (:func:`read_published`) resolve the pointer first, so they
    see the previous snapshot until the rename — a crash anywhere before
    the rename leaves the old snapshot intact and the half-written
    version directory invisible as garbage for retention cleanup.
    Old versions stay readable for in-flight queries (snapshot
    isolation); `cleanup_old_files`-style retention prunes them later.

    Returns the published version id.  The commit rename runs through the
    ``fs`` verbs, so the same protocol publishes to hdfs:// (atomic
    rename) and s3a:// (last-writer-wins pointer PUT) tables; when ``fs``
    is None it is picked from the root path's scheme."""
    if fs is None:
        first = next(iter(tables.values()), None)
        spark = first.sparkSession if first is not None else None
        fs = filesystem_for(spark, str(root))
    root = str(root)
    fs.mkdirs(root)
    version = f"v-{uuid.uuid4().hex}"
    for name, df in tables.items():
        df.write.mode("errorifexists").parquet(
            posixpath.join(root, version, name)
        )
    commit_version(root, version, sorted(tables), fs=fs)
    return version


def commit_version(
    root: str | Path, version: str, table_names: list[str], fs=None
) -> None:
    """The commit point of the stage-then-publish protocol: write the
    manifest into the (fully staged) version directory, then atomically
    rename a temp pointer file onto ``_CURRENT`` (the overwrite-rename
    verb — POSIX/HDFS atomic; object stores degrade to last-writer-wins,
    which is exactly the guarantee their own pointer-style committers
    give).  Callers that stage their own writes (e.g. the pipeline's
    gold build, which needs its materialize-then-derive fact checkpoint
    mid-stage) call this directly; :func:`publish_tables` is the
    one-shot convenience."""
    import json as _json

    if fs is None:
        fs = filesystem_for(None, str(root))
    root = str(root)
    fs.write_text(
        posixpath.join(root, version, "_manifest.json"),
        _json.dumps({"version": version, "tables": list(table_names)}),
    )
    tmp_ptr = posixpath.join(root, f".ptr-{uuid.uuid4().hex}")
    fs.write_text(tmp_ptr, version)
    # the atomic commit point
    fs.replace_file(tmp_ptr, posixpath.join(root, CURRENT_POINTER))


def resolve_table_path(root: str | Path, name: str, fs=None) -> str:
    """Reader-side resolution: honor the ``_CURRENT`` snapshot pointer
    when present, else fall back to the flat legacy layout — so readers
    work identically against published and unpublished directories."""
    if fs is None:
        fs = filesystem_for(None, str(root))
    root = str(root)
    ptr = posixpath.join(root, CURRENT_POINTER)
    if fs.exists(ptr):
        return posixpath.join(root, fs.read_text(ptr).strip(), name)
    return posixpath.join(root, name)


def read_published(
    spark: SparkSession, root: str | Path, name: str, fs=None
) -> DataFrame:
    """Read table ``name`` from the currently-published snapshot (resolves
    the ``_CURRENT`` pointer written by :func:`publish_tables`)."""
    if fs is None:
        fs = filesystem_for(spark, str(root))
    return spark.read.parquet(resolve_table_path(root, name, fs=fs))


def published_versions(root: str | Path, fs=None) -> list[str]:
    """All version directories under ``root`` (current + historical)."""
    if fs is None:
        fs = filesystem_for(None, str(root))
    return sorted(posixpath.basename(p) for p in fs.glob(str(root), "v-*"))


def overwrite_dynamic_partitions(
    df: DataFrame, path: str, *partition_cols: str
) -> None:
    """Overwrite ONLY the partitions present in `df`, leaving every other
    partition's files untouched (no read, no rewrite, no mtime change).

    This is the incremental-refresh primitive for the gold layer: build
    the changed month(s), write them, done — the 100 TB replacement for
    the reference's truncate-and-reload.  The session flag is restored
    after the write, so surrounding code keeps static-overwrite
    semantics."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)
