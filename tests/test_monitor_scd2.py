"""Monitoring report (Q7-Q10) and the true-SCD2 merge extension."""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark import monitor
from ecommerce_data_pipeline_23a91a05i4_spark.operators.scd2 import scd2_merge


def test_monitoring_report_fresh_pipeline(spark, pipeline_base):
    base, _ = pipeline_base
    report = monitor.run_monitoring(
        spark, base, datetime(2024, 1, 1, 0, 30), out=base / "reports"
    )
    assert report["warehouse_null_keys"] == {
        "customer_key": 0, "product_key": 0, "date_key": 0
    }
    assert all(not f["stale"] for f in report["freshness"].values())
    # the tiny test corpus (300 txns / 365 days) legitimately triggers
    # volume 3-sigma flags; staleness must not
    assert not any(
        a.startswith("stale_") for a in report["health"]["alerts"]
    ), report["health"]
    on_disk = json.loads((base / "reports" / "monitoring_report.json").read_text())
    assert on_disk["health"]["status"] == report["health"]["status"]


def test_volume_anomaly_band(spark):
    # 30 uniform days + one 10x spike: exactly the spike is flagged
    rows = [(f"2024-01-{d:02d}",) for d in range(1, 31) for _ in range(20)]
    rows += [("2024-01-31",)] * 200
    df = spark.createDataFrame(rows, ["d"]).select(F.col("d").cast("date").alias("d"))
    out = monitor.volume_anomaly(df, "d", datetime(2024, 2, 1))
    assert [a["date"] for a in out["anomalies"]] == ["2024-01-31"]
    assert out["anomalies"][0]["type"] == "spike"

    uniform = monitor.volume_anomaly(
        df.filter(F.col("d") < "2024-01-31"), "d", datetime(2024, 2, 1)
    )
    assert uniform["anomalies"] == []


def test_monitoring_detects_staleness(spark, pipeline_base):
    base, _ = pipeline_base
    report = monitor.run_monitoring(spark, base, datetime(2024, 3, 1))
    assert report["health"]["status"] in ("degraded", "critical")
    assert any(a.startswith("stale_") for a in report["health"]["alerts"])


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "customer_id string, city string, effective_date date, end_date date, is_current boolean"
    )


def test_scd2_merge_change_new_unchanged(spark):
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    current = _dim(
        spark,
        [
            ("C1", "Pune", d0, None, True),
            ("C2", "Delhi", d0, None, True),
        ],
    )
    updates = spark.createDataFrame(
        [("C1", "Mumbai"), ("C2", "Delhi"), ("C3", "Chennai")],
        "customer_id string, city string",
    )
    out = scd2_merge(current, updates, "customer_id", ["city"], "2024-02-01")
    rows = {(r.customer_id, r.is_current): r for r in out.collect()}

    # C1 changed: old version closed out, new current version
    assert rows[("C1", False)].city == "Pune"
    assert str(rows[("C1", False)].end_date) == "2024-02-01"
    assert rows[("C1", True)].city == "Mumbai"
    assert str(rows[("C1", True)].effective_date) == "2024-02-01"
    # C2 unchanged: untouched
    assert rows[("C2", True)].city == "Delhi"
    assert str(rows[("C2", True)].effective_date) == "2024-01-01"
    # C3 new: inserted current
    assert rows[("C3", True)].city == "Chennai"
    assert out.count() == 4


def test_scd2_merge_is_idempotent(spark):
    import datetime as dt

    current = _dim(spark, [("C1", "Pune", dt.date(2024, 1, 1), None, True)])
    updates = spark.createDataFrame([("C1", "Pune")], "customer_id string, city string")
    out = scd2_merge(current, updates, "customer_id", ["city"], "2024-02-01")
    assert out.count() == 1
    r = out.collect()[0]
    assert r.is_current and str(r.effective_date) == "2024-01-01"


def _make_fs(spark, kind):
    """The swap suite runs under BOTH filesystem implementations: the
    POSIX one (bare local paths) and the JVM Hadoop FileSystem that a
    real deployment uses for hdfs:// and s3a:// tables — same local
    directory underneath, so crash/byte-untouched assertions apply
    identically."""
    from ecommerce_data_pipeline_23a91a05i4_spark.sources.fs import (
        HadoopFS,
        PosixFS,
    )

    return PosixFS() if kind == "posix" else HadoopFS(spark)


import pytest


@pytest.mark.parametrize("fs_kind", ["posix", "hadoop"])
def test_scd2_partitioned_merge_touches_only_affected_partitions(
    spark, tmp_path, fs_kind
):
    """The partition-pruned merge: a 2-key CDC batch against a 60-key
    dimension must (a) produce exactly the full scd2_merge answer,
    (b) report only the buckets holding updated keys, and (c) leave every
    other partition's files byte-untouched (same paths, sizes, mtimes —
    never read, never rewritten)."""
    import datetime as dt
    import os
    from pathlib import Path

    from ecommerce_data_pipeline_23a91a05i4_spark.operators.scd2 import (
        SCD2_BUCKET_COL,
        scd2_bucket,
        scd2_merge_partitioned,
        write_dim_partitioned,
    )

    d0 = dt.date(2024, 1, 1)
    dim = _dim(
        spark, [(f"C{i}", f"city{i}", d0, None, True) for i in range(60)]
    )
    path = str(tmp_path / "dim_customers")
    n_buckets = 8
    write_dim_partitioned(dim, path, "customer_id", n_buckets)

    def file_stats():
        out = {}
        for p in Path(path).rglob("*.parquet"):
            st = os.stat(p)
            out[str(p)] = (st.st_size, st.st_mtime_ns)
        return out

    before = file_stats()

    updates = spark.createDataFrame(
        [("C3", "Mumbai"), ("C100", "Chennai")],
        "customer_id string, city string",
    )
    affected = scd2_merge_partitioned(
        spark, path, updates, "customer_id", ["city"], "2024-02-01", n_buckets,
        fs=_make_fs(spark, fs_kind),
    )

    expect_buckets = sorted(
        r.b
        for r in updates.select(
            scd2_bucket(F.col("customer_id"), n_buckets).alias("b")
        )
        .distinct()
        .collect()
    )
    assert affected == expect_buckets and 0 < len(affected) < n_buckets

    after = file_stats()
    prefix = {f"{SCD2_BUCKET_COL}={b}" for b in affected}
    untouched_before = {
        p: s for p, s in before.items()
        if not any(seg in p for seg in prefix)
    }
    untouched_after = {
        p: s for p, s in after.items()
        if not any(seg in p for seg in prefix)
    }
    assert untouched_before == untouched_after  # identical files, stats and all
    assert untouched_before  # the assertion actually covers partitions

    got = {
        (r.customer_id, r.city, str(r.effective_date), str(r.end_date), r.is_current)
        for r in spark.read.parquet(path).drop(SCD2_BUCKET_COL).collect()
    }
    want = {
        (r.customer_id, r.city, str(r.effective_date), str(r.end_date), r.is_current)
        for r in scd2_merge(
            dim, updates, "customer_id", ["city"], "2024-02-01"
        ).collect()
    }
    assert got == want


class _ExplodingFS:
    """Delegating fs wrapper that raises on the Nth rename — simulates a
    crash at a chosen point inside the swap loop.  The rollback pass at
    the start of a retry uses a fresh (non-exploding) fs."""

    def __init__(self, inner, die_on: int) -> None:
        self.inner = inner
        self.die_on = die_on
        self.n = 0

    def rename(self, src, dst):
        self.n += 1
        if self.n == self.die_on:
            raise OSError("simulated crash mid-swap")
        self.inner.rename(src, dst)

    def exists(self, p):
        return self.inner.exists(p)

    def delete(self, p):
        self.inner.delete(p)

    def glob(self, d, pat):
        return self.inner.glob(d, pat)


@pytest.mark.parametrize("fs_kind", ["posix", "hadoop"])
@pytest.mark.parametrize("die_on", [2, 3])
def test_scd2_partitioned_merge_crash_mid_swap_leaves_whole_partitions(
    spark, tmp_path, fs_kind, die_on
):
    """Crash discipline of the stage-then-swap publish: wherever the
    process dies inside the swap loop (die_on=2: mid-bucket, after the
    live partition was set aside but before the new one moved in;
    die_on=3: between buckets, first published and second still old),
    every partition directory is either fully old, fully new, or hidden
    behind its `.old` marker — never a mix of old and new files — and a
    retry (idempotent re-merge) rolls back the marker and converges."""
    import datetime as dt

    from ecommerce_data_pipeline_23a91a05i4_spark.operators import scd2 as s2

    d0 = dt.date(2024, 1, 1)
    dim = _dim(
        spark, [(f"C{i}", f"city{i}", d0, None, True) for i in range(40)]
    )
    path = str(tmp_path / "dim_crash")
    n_buckets = 8
    s2.write_dim_partitioned(dim, path, "customer_id", n_buckets)

    # updates that hit at least two distinct buckets
    upd_rows = [("C1", "X1"), ("C2", "X2"), ("C3", "X3"), ("C4", "X4")]
    updates = spark.createDataFrame(upd_rows, "customer_id string, city string")

    with pytest.raises(OSError, match="simulated crash"):
        s2.scd2_merge_partitioned(
            spark, path, updates, "customer_id", ["city"], "2024-02-01",
            n_buckets, fs=_ExplodingFS(_make_fs(spark, fs_kind), die_on),
        )

    # every partition dir must be internally consistent: reading the
    # table succeeds and each business key has EXACTLY one current row —
    # i.e. a partition is wholly old, wholly new, or wholly hidden
    got = spark.read.parquet(path)
    per_key = (
        got.filter("is_current").groupBy("customer_id").count().collect()
    )
    assert all(r["count"] == 1 for r in per_key)
    # retry converges to the full merge result
    s2.scd2_merge_partitioned(
        spark, path, updates, "customer_id", ["city"], "2024-02-01",
        n_buckets, fs=_make_fs(spark, fs_kind),
    )
    final = {
        (r.customer_id, r.city, r.is_current)
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r.customer_id, r.city, r.is_current)
        for r in scd2_merge(
            dim, updates, "customer_id", ["city"], "2024-02-01"
        ).collect()
    }
    assert final == want


def test_scd2_swap_refuses_to_drop_partition_when_stage_missing(
    spark, tmp_path
):
    """The swap must verify the staged bucket output exists BEFORE
    setting the live partition aside: a missing stage dir aborts with
    the live data untouched (it would otherwise be silent data loss)."""
    import datetime as dt

    from ecommerce_data_pipeline_23a91a05i4_spark.operators import scd2 as s2
    from ecommerce_data_pipeline_23a91a05i4_spark.sources.fs import PosixFS

    d0 = dt.date(2024, 1, 1)
    dim = _dim(
        spark, [(f"C{i}", f"city{i}", d0, None, True) for i in range(40)]
    )
    path = str(tmp_path / "dim_guard")
    n_buckets = 8
    s2.write_dim_partitioned(dim, path, "customer_id", n_buckets)
    before = {
        (r.customer_id, r.city, r.is_current)
        for r in spark.read.parquet(path).collect()
    }

    class VanishingStageFS(PosixFS):
        # claim every staged bucket is missing
        def exists(self, p):
            if "__scd2_stage" in str(p):
                return False
            return super().exists(p)

    updates = spark.createDataFrame(
        [("C1", "X1")], "customer_id string, city string"
    )
    with pytest.raises(RuntimeError, match="staged output missing"):
        s2.scd2_merge_partitioned(
            spark, path, updates, "customer_id", ["city"], "2024-02-01",
            n_buckets, fs=VanishingStageFS(),
        )
    after = {
        (r.customer_id, r.city, r.is_current)
        for r in spark.read.parquet(path).collect()
    }
    assert after == before  # live table untouched


def test_scd2_merge_dedupes_update_batch(spark):
    import datetime as dt

    current = _dim(spark, [("C1", "Pune", dt.date(2024, 1, 1), None, True)])
    updates = spark.createDataFrame(
        [("C1", "Mumbai"), ("C1", "Goa")], "customer_id string, city string"
    )
    out = scd2_merge(current, updates, "customer_id", ["city"], "2024-02-01")
    current_rows = out.filter("is_current").collect()
    assert len(current_rows) == 1  # one-current-row invariant holds
    assert current_rows[0].city in ("Mumbai", "Goa")


def test_monitoring_detects_stale_gold(spark, pipeline_base, tmp_path):
    """Gold freshness must probe the GOLD layer: rewrite gold fact with an
    old created_at and confirm stale_gold fires while silver stays fresh."""
    import shutil as sh
    from pyspark.sql import functions as F2

    base, _ = pipeline_base
    clone = tmp_path / "lake"
    sh.copytree(base, clone)
    fact = spark.read.parquet(str(base / "gold" / "fact_sales"))
    fact.withColumn(
        "created_at", F2.lit("2023-06-01 00:00:00").cast("timestamp")
    ).write.mode("overwrite").parquet(str(clone / "gold" / "fact_sales"))
    report = monitor.run_monitoring(spark, clone, datetime(2024, 1, 1, 0, 30))
    assert report["freshness"]["gold"]["stale"]
    assert not report["freshness"]["silver"]["stale"]
    assert "stale_gold" in report["health"]["alerts"]
