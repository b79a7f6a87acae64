"""Uniform source/sink registry (SURVEY.md §2.1).

The reference's I/O surface is CSV files + a PostgreSQL database + JSON
report files (S1-S8).  Here each becomes a format handler with one
signature, so pipeline code names a format instead of hand-rolling reader
options:

    read(spark, "csv", path, schema=...)   # S1 — schema-enforced, header
    read(spark, "parquet", path)           # S2 — lakehouse default
    read(spark, "json", path)              # report/JSON-lines ingest
    read(spark, "jdbc", url, table=...)    # S2 database interop — full
                                           #   impl in sources/jdbc.py
    write(df, "parquet", path, mode=...)   # S4/S5
    write(df, "csv_single", path)          # S6/S7 single-file golden CSVs

Streaming twins live in streaming/ingest.py.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    if fmt == "csv":
        reader = spark.read.option("header", True)
        if schema is not None:
            reader = reader.schema(schema)  # DDL types authoritative (S1)
        else:
            reader = reader.option("inferSchema", True)
        return reader.options(**options).csv(path)
    if fmt == "parquet":
        return spark.read.options(**options).parquet(path)
    if fmt == "txtable":
        # transactional manifest-log table (sources/txtable.py): reads
        # resolve the latest committed snapshot; version=N time-travels
        from .txtable import TxTable

        version = options.pop("version", None)
        if options:
            # other formats pass options to the Spark reader; the manifest
            # log has no reader options, so silently dropping them would
            # hide caller bugs (ADVICE r4)
            raise ValueError(
                f"txtable source takes only version=...; got {sorted(options)}"
            )
        return TxTable(spark, path).snapshot(version=version)
    if fmt == "json":
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.options(**options).json(path)
    if fmt == "jdbc":
        # S2: the reference's Postgres leg (staging_to_production.py:
        # 138-141 reads whole staging tables over one connection).  Full
        # partitioned/pushdown implementation in sources/jdbc.py; tested
        # end-to-end against pyspark's bundled embedded Derby driver.
        from .jdbc import read_jdbc

        table = options.pop("table", None)
        query = options.pop("query", None)
        return read_jdbc(spark, path, table, query=query, **options)
    raise KeyError(f"unknown source format {fmt!r}")


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSON-lines ingest that QUARANTINES bad rows
    instead of silently nulling (PERMISSIVE default) or dropping
    (DROPMALFORMED) them — at 100 TB there are always malformed lines,
    and both silent behaviors corrupt downstream counts.

    Returns (valid, quarantine): `valid` carries the declared schema
    exactly; `quarantine` is one string column of the raw offending
    lines, writable to a dead-letter location for replay.  The split is
    two filters over ONE permissive read — Spark caches nothing here, but
    both branches push the corrupt-null test into the same scan.

    Implementation note: built on text-source + from_json rather than the
    JSON file source, because Spark disallows queries that reference only
    the corrupt-record column of a raw file scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the suggested
    workaround is cache(), unacceptable at ingest scale).  Text-source
    parsing is the same JVM JSON parser, keeps the raw line first-class,
    and stays fully pushdown/codegen-friendly."""
    full_schema = StructType(schema.fields).add(corrupt_col, "string")
    lines = spark.read.text(path)
    parsed = lines.select(
        F.col("value").alias("raw_line"),
        F.from_json(
            "value",
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("j"),
    )
    bad = F.col("j").isNull() | F.col(f"j.{corrupt_col}").isNotNull()
    valid = (
        parsed.filter(~bad)
        .select("j.*")
        .drop(corrupt_col)
    )
    quarantine = parsed.filter(bad).select("raw_line")
    return valid, quarantine


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed, sorted external parquet table — the co-located-join layout
    (SURVEY.md §4: the reference's b-tree indexes on join keys,
    create_production_schema.sql:96-107, map to partitioning/clustering in
    the lakehouse).

    Two tables written with the SAME (key, buckets) spec join with ZERO
    shuffle: the scan reports ``Bucketed: true`` and the sort-merge join
    plans no Exchange on either side — at 100 TB that removes the single
    most expensive stage of a fact⋈fact join (e.g. items⋈transactions,
    re-joined by every quality check and warehouse load).  Equality filters
    on the bucket key additionally prune to one bucket
    (``SelectedBucketsCount 1 out of n``).

    The input is pre-repartitioned by the bucket expression so each task
    holds exactly one bucket → one file per bucket (without it, every
    write task emits a file per bucket it touches, and a sorted bucket
    split across files forfeits the sort at read time).
    """
    from pyspark.sql import functions as F

    writer = (
        df.repartition(buckets, F.col(key))
        .write.mode(mode)
        .option("path", path)
        .format("parquet")
        .bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def write(df: DataFrame, fmt: str, path: str, mode: str = "overwrite", **options) -> None:
    if fmt == "parquet":
        partition_by = options.pop("partitionBy", None)
        writer = df.write.mode(mode).options(**options)
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(path)
        return
    if fmt == "csv":
        df.write.mode(mode).option("header", True).options(**options).csv(path)
        return
    if fmt == "csv_single":
        # single-file golden output (S6): coalesce(1) then unwrap the part
        # file — only for small result sets, never fact-sized data
        tmp = f"{path}__tmp"
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
        part = next(Path(tmp).glob("part-*.csv"))
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        shutil.move(str(part), path)
        shutil.rmtree(tmp, ignore_errors=True)
        return
    if fmt == "json":
        df.write.mode(mode).options(**options).json(path)
        return
    if fmt == "jdbc":
        # S2 write leg: `path` is the JDBC URL, table= names the target.
        # Batched inserts, one connection per partition (sources/jdbc.py).
        from .jdbc import write_jdbc

        table = options.pop("table", None)
        if table is None:
            raise ValueError("jdbc sink requires table=...")
        write_jdbc(df, path, table, mode=mode, **options)
        return
    if fmt == "txtable":
        # transactional manifest-log sink: "overwrite" commits a new
        # snapshot (creating the table on first write), "append" adds
        # files under optimistic concurrency — both are single atomic
        # manifest commits, crash-safe on object stores
        from .txtable import TxTable

        t = TxTable(df.sparkSession, path)
        partition_by = options.pop("partitionBy", None)
        if options:
            # the manifest log consumes no writer options — raising beats
            # the silent no-op other formats would at least forward
            # (ADVICE r4)
            raise ValueError(
                f"txtable sink takes only partitionBy=...; got {sorted(options)}"
            )
        if mode not in ("append", "overwrite"):
            raise ValueError(f"txtable sink: unsupported mode {mode!r}")
        if t.latest_version() is None:
            # first write creates the table under either supported mode;
            # unknown modes are rejected above, never silently init'd
            t.init(df, partition_by=partition_by)
        elif mode == "append":
            t.append(df)
        else:
            t.overwrite(df, partition_by=partition_by)
        return
    raise KeyError(f"unknown sink format {fmt!r}")
