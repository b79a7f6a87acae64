"""Table-maintenance operators: compaction preserves content while
collapsing file counts; dynamic partition overwrite leaves untouched
partitions byte-for-byte (and mtime-for-mtime) alone."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.sources.maintenance import (
    compact_parquet,
    overwrite_dynamic_partitions,
    parquet_data_files,
)


def test_compact_parquet_reduces_files_preserves_content(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 small files
    before_sum = spark.read.parquet(path).agg(F.sum("v")).collect()[0][0]
    n_before = len(parquet_data_files(path))
    assert n_before >= 64

    stats = compact_parquet(spark, path, target_file_bytes=10**9)
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1

    after = spark.read.parquet(path)
    assert after.count() == 10000
    assert after.agg(F.sum("v")).collect()[0][0] == before_sum


def test_dynamic_overwrite_touches_only_changed_partition(spark, tmp_path):
    path = str(tmp_path / "bymonth")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0), (2, "2024-02", 20.0), (3, "2024-03", 30.0)],
        "id long, month string, v double",
    )
    base.write.partitionBy("month").parquet(path)
    jan_files = {
        p: p.stat().st_mtime_ns
        for p in parquet_data_files(path)
        if "month=2024-01" in str(p)
    }
    assert jan_files

    # rewrite ONLY February with new values
    feb = spark.createDataFrame(
        [(20, "2024-02", 99.0)], "id long, month string, v double"
    )
    overwrite_dynamic_partitions(feb, path, "month")

    # January files: same paths, same mtimes — physically untouched
    for p, mtime in jan_files.items():
        assert p.exists() and p.stat().st_mtime_ns == mtime

    got = {
        (r.month, r.id, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2024-01", 1, 10.0),
        ("2024-02", 20, 99.0),
        ("2024-03", 3, 30.0),
    }
    # session flag restored to static
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"
    )


def test_static_overwrite_would_have_dropped_other_partitions(spark, tmp_path):
    """Contrast case documenting WHY the dynamic mode exists: a plain
    overwrite of one month wipes the other partitions."""
    path = str(tmp_path / "wipe")
    spark.createDataFrame(
        [(1, "2024-01", 1.0), (2, "2024-02", 2.0)],
        "id long, month string, v double",
    ).write.partitionBy("month").parquet(path)
    spark.createDataFrame(
        [(9, "2024-02", 9.0)], "id long, month string, v double"
    ).write.mode("overwrite").partitionBy("month").parquet(path)
    months = {r.month for r in spark.read.parquet(path).collect()}
    assert months == {"2024-02"}  # January is gone — the S5 failure mode


def test_publish_tables_cross_table_atomic(spark, tmp_path):
    """Readers always see one consistent snapshot: both tables flip
    together at the pointer swap, and a half-staged new version is
    invisible until committed."""
    from ecommerce_data_pipeline_23a91a05i4_spark.sources import maintenance as mt

    root = tmp_path / "pub"
    a1 = spark.range(5).withColumnRenamed("id", "a")
    b1 = spark.range(7).withColumnRenamed("id", "b")
    v1 = mt.publish_tables({"ta": a1, "tb": b1}, root)
    assert mt.read_published(spark, root, "ta").count() == 5
    assert mt.read_published(spark, root, "tb").count() == 7

    # simulate a crash mid-publish: stage new data WITHOUT the pointer swap
    import uuid as _uuid

    stale = root / f"v-{_uuid.uuid4().hex}"
    spark.range(99).withColumnRenamed("id", "a").write.parquet(str(stale / "ta"))
    assert mt.read_published(spark, root, "ta").count() == 5  # old snapshot intact

    # a real second publish flips both tables at once
    v2 = mt.publish_tables(
        {"ta": spark.range(11).withColumnRenamed("id", "a"),
         "tb": spark.range(13).withColumnRenamed("id", "b")},
        root,
    )
    assert v2 != v1
    assert mt.read_published(spark, root, "ta").count() == 11
    assert mt.read_published(spark, root, "tb").count() == 13
    # historical snapshot still readable (snapshot isolation for in-flight readers)
    assert spark.read.parquet(str(root / v1 / "ta")).count() == 5
    assert set(mt.published_versions(root)) >= {v1, v2}


def test_publish_and_compact_through_hadoop_filesystem(spark, tmp_path):
    """The publish pointer swap and the compaction swap must run
    unchanged through the JVM Hadoop FileSystem verbs — the path a
    deployment on hdfs:// or s3a:// takes.  Same local directory
    underneath, so results must be identical to the POSIX run,
    including the overwrite-rename of an existing _CURRENT pointer."""
    from ecommerce_data_pipeline_23a91a05i4_spark.sources import maintenance as mt
    from ecommerce_data_pipeline_23a91a05i4_spark.sources.fs import HadoopFS

    hfs = HadoopFS(spark)
    root = str(tmp_path / "pub_hadoop")
    v1 = mt.publish_tables(
        {"ta": spark.range(5).withColumnRenamed("id", "a")}, root, fs=hfs
    )
    assert mt.read_published(spark, root, "ta", fs=hfs).count() == 5
    # second publish must overwrite-rename the existing pointer
    v2 = mt.publish_tables(
        {"ta": spark.range(11).withColumnRenamed("id", "a")}, root, fs=hfs
    )
    assert v2 != v1
    assert mt.read_published(spark, root, "ta", fs=hfs).count() == 11
    assert set(mt.published_versions(root, fs=hfs)) == {v1, v2}

    # compaction: many tiny files -> few, content preserved, via HadoopFS
    tbl = str(tmp_path / "many_hadoop")
    spark.range(1000).repartition(20).write.parquet(tbl)
    stats = mt.compact_parquet(spark, tbl, target_file_bytes=1 << 30, fs=hfs)
    assert stats["files_before"] == 20 and stats["files_after"] == 1
    assert spark.read.parquet(tbl).count() == 1000
