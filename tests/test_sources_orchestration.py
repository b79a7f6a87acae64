"""Source registry formats + orchestrator retry/backoff semantics."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ecommerce_data_pipeline_23a91a05i4_spark.pipeline import PipelineReport, run_step
from ecommerce_data_pipeline_23a91a05i4_spark.sources import registry


def test_csv_roundtrip_with_schema(spark, tmp_path):
    schema = StructType([
        StructField("id", IntegerType()),
        StructField("name", StringType()),
    ])
    src = tmp_path / "in.csv"
    src.write_text("id,name\n1,a\n2,b\n")
    df = registry.read(spark, "csv", str(src), schema=schema)
    assert df.schema == schema
    assert df.count() == 2

    out = tmp_path / "single.csv"
    registry.write(df, "csv_single", str(out))
    assert out.read_text().splitlines()[0] == "id,name"


def test_parquet_and_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    registry.write(df, "parquet", str(tmp_path / "p"))
    assert registry.read(spark, "parquet", str(tmp_path / "p")).count() == 1
    registry.write(df, "json", str(tmp_path / "j"))
    assert registry.read(spark, "json", str(tmp_path / "j")).count() == 1


def test_jdbc_is_gated(spark):
    with pytest.raises((NotImplementedError, Exception)):
        registry.read(spark, "jdbc", "jdbc:postgresql://nowhere/db", table="t")
    with pytest.raises(ValueError):
        registry.read(spark, "jdbc", "jdbc:postgresql://nowhere/db")


def test_unknown_format_rejected(spark):
    with pytest.raises(KeyError):
        registry.read(spark, "avro", "/tmp/x")


def test_run_step_retries_with_backoff():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")

    report = PipelineReport()
    ok = run_step("flaky", flaky, report, backoff=[0, 0, 0])
    assert ok and len(attempts) == 3
    assert report.steps[0].status == "success"
    assert report.steps[0].retries == 2


def test_run_step_fail_fast_after_exhaustion():
    def always_fails():
        raise RuntimeError("permanent")

    report = PipelineReport()
    ok = run_step("broken", always_fails, report, backoff=[0, 0, 0])
    assert not ok
    assert report.steps[0].status == "failed"
    assert "permanent" in report.steps[0].error
    assert report.to_dict()["overall_status"] == "failed"


def test_cleanup_old_files_retention(tmp_path):
    """X5 retention (standalone entry point, like the reference's
    cleanup_old_data.py script): old files deleted, preserved-name and
    recent files kept."""
    import os
    import time as _time

    from ecommerce_data_pipeline_23a91a05i4_spark.pipeline import cleanup_old_files

    old = _time.time() - 10 * 86400
    files = {
        "raw/data.csv": old,                       # old → deleted
        "raw/generation_metadata.json": old,       # preserved name → kept
        "reports/quality_report.json": old,        # preserved name → kept
        "logs/run.log": old,                       # old → deleted
        "raw/fresh.csv": _time.time(),             # recent → kept
    }
    for rel, mtime in files.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("x")
        os.utime(p, (mtime, mtime))

    removed = cleanup_old_files(tmp_path, retention_days=7)
    removed_rel = {str(Path(r).relative_to(tmp_path)) for r in removed}
    assert removed_rel == {"raw/data.csv", "logs/run.log"}
    assert (tmp_path / "raw/generation_metadata.json").exists()
    assert (tmp_path / "reports/quality_report.json").exists()
    assert (tmp_path / "raw/fresh.csv").exists()


def test_jsonl_quarantine_splits_bad_lines(spark, tmp_path):
    """Malformed JSON lines land in the quarantine with their raw text;
    valid rows carry the declared schema; nothing is silently dropped."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from ecommerce_data_pipeline_23a91a05i4_spark.sources.registry import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "events.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"id": 1, "name": "ok"}',
                "this is not json at all",
                '{"id": 2, "name": "also ok"}',
                '{"id": "not-a-number", "name": "type clash"}',
                '{"id": 3, "name": "fine"}',
                '{"broken": ',
            ]
        )
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    valid, quarantine = read_jsonl_quarantine(spark, str(p), schema)
    v = valid.orderBy("id").collect()
    q = quarantine.collect()
    assert [(r.id, r.name) for r in v] == [(1, "ok"), (2, "also ok"), (3, "fine")]
    assert len(q) == 3
    assert valid.columns == ["id", "name"]
    raws = {r.raw_line for r in q}
    assert "this is not json at all" in raws
    assert any("not-a-number" in r for r in raws)
    # conservation: every input line is either valid or quarantined
    assert valid.count() + quarantine.count() == 6
