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

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


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
) -> dict:
    """Rewrite a parquet directory into ~target_file_bytes files.

    File count is sized from the CURRENT on-disk bytes (compressed), so
    the rewrite preserves compression ratio assumptions; repartition (not
    coalesce) is used so the rewrite also rebalances skewed input files.
    The swap is write-aside + rename — readers see either the old layout
    or the new one, never a mix; the directory is replaced only after
    the new write fully commits (Spark's _SUCCESS protocol).

    Returns {files_before, files_after, bytes}."""
    src = Path(path)
    files = parquet_data_files(src)
    total = sum(f.stat().st_size for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(str(src))
    tmp = src.parent / f".compact-{uuid.uuid4().hex}"
    df.repartition(n_out).write.mode("overwrite").parquet(str(tmp))
    old = src.parent / f".old-{uuid.uuid4().hex}"
    src.rename(old)
    tmp.rename(src)
    shutil.rmtree(old)
    return {
        "files_before": len(files),
        "files_after": len(parquet_data_files(src)),
        "bytes": total,
    }


# --------------------------------------------- atomic multi-table publish

CURRENT_POINTER = "_CURRENT"


def publish_tables(
    tables: dict[str, DataFrame], root: str | Path
) -> str:
    """Cross-table atomic publish: stage-then-pointer-swap.

    The reference loads the warehouse under one Postgres transaction
    (ingest_to_staging.py autocommit=False — SURVEY §2.12 X6); plain
    per-table parquet overwrites are atomic per TABLE but a reader can
    observe table A from the new load with table B from the old one.
    This primitive restores cross-table atomicity with the standard
    lakehouse snapshot pattern (the minimal form of what Delta/Iceberg
    commit logs do):

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

    Returns the published version id."""
    rootp = Path(root)
    rootp.mkdir(parents=True, exist_ok=True)
    version = f"v-{uuid.uuid4().hex}"
    vdir = rootp / version
    for name, df in tables.items():
        df.write.mode("errorifexists").parquet(str(vdir / name))
    commit_version(rootp, version, sorted(tables))
    return version


def commit_version(
    root: str | Path, version: str, table_names: list[str]
) -> None:
    """The commit point of the stage-then-publish protocol: write the
    manifest into the (fully staged) version directory, then atomically
    rename a temp pointer file onto ``_CURRENT``.  Callers that stage
    their own writes (e.g. the pipeline's gold build, which needs its
    materialize-then-derive fact checkpoint mid-stage) call this
    directly; :func:`publish_tables` is the one-shot convenience."""
    import json as _json

    rootp = Path(root)
    with open(rootp / version / "_manifest.json", "w") as fh:
        _json.dump({"version": version, "tables": list(table_names)}, fh)
    tmp_ptr = rootp / f".ptr-{uuid.uuid4().hex}"
    tmp_ptr.write_text(version)
    tmp_ptr.rename(rootp / CURRENT_POINTER)  # the atomic commit point


def resolve_table_path(root: str | Path, name: str) -> str:
    """Reader-side resolution: honor the ``_CURRENT`` snapshot pointer
    when present, else fall back to the flat legacy layout — so readers
    work identically against published and unpublished directories."""
    rootp = Path(root)
    ptr = rootp / CURRENT_POINTER
    if ptr.exists():
        return str(rootp / ptr.read_text().strip() / name)
    return str(rootp / name)


def read_published(
    spark: SparkSession, root: str | Path, name: str
) -> DataFrame:
    """Read table ``name`` from the currently-published snapshot (resolves
    the ``_CURRENT`` pointer written by :func:`publish_tables`)."""
    return spark.read.parquet(resolve_table_path(root, name))


def published_versions(root: str | Path) -> list[str]:
    """All version directories under ``root`` (current + historical)."""
    return sorted(
        p.name for p in Path(root).iterdir() if p.is_dir() and p.name.startswith("v-")
    )


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
