"""Config-file entry point: the reference's config.yaml keys map onto the
pipeline (config/config.yaml:15-23,28-33,43-47)."""

from __future__ import annotations

import json
import textwrap

from ecommerce_data_pipeline_23a91a05i4_spark.config import (
    PipelineConfig,
    load_config,
)

REFERENCE_SHAPED_YAML = textwrap.dedent(
    """
    database:
      host: localhost
      port: 5432
    data_generation:
      customers: 120
      products: 34
      transactions: 560
      start_date: "2023-01-01"
      end_date: "2023-12-31"
    pipeline:
      batch_size: 1000
      max_retries: 4
      retry_delay_seconds: 2
    bi_tool:
      tool: tableau
    scheduler:
      daily_run_time: "03:30"
      timezone: "Asia/Kolkata"
      retention_days: 9
    """
)


def test_yaml_config_maps_reference_keys(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_SHAPED_YAML)
    cfg = load_config(p)
    assert (cfg.customers, cfg.products, cfg.transactions) == (120, 34, 560)
    assert cfg.run_date == "2023-01-01"
    assert cfg.max_retries == 4 and cfg.retry_delay_seconds == 2.0
    assert cfg.daily_run_time == "03:30" and cfg.retention_days == 9
    # out-of-scope sections are surfaced, not silently dropped
    assert cfg.ignored_sections == ("database", "bi_tool")


def test_json_config_parses_identically(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(
        json.dumps(
            {
                "data_generation": {"customers": 7},
                "scheduler": {"retention_days": 2},
            }
        )
    )
    cfg = load_config(p)
    assert cfg.customers == 7 and cfg.retention_days == 2
    assert cfg.products == 500  # defaults fill unspecified keys


def test_backoff_attempt_count_matches_max_retries():
    assert PipelineConfig(max_retries=3, retry_delay_seconds=5).backoff() == [5, 10]
    assert PipelineConfig(max_retries=1).backoff() == []


def test_pipeline_main_reads_config_and_runs(spark, tmp_path):
    """End-to-end: main(--config) drives datagen sizes from the file and
    produces a successful execution report."""
    from ecommerce_data_pipeline_23a91a05i4_spark import pipeline

    cfgfile = tmp_path / "config.yaml"
    cfgfile.write_text(
        textwrap.dedent(
            """
            data_generation:
              customers: 50
              products: 20
              transactions: 200
            pipeline:
              max_retries: 2
              retry_delay_seconds: 0
            """
        )
    )
    base = tmp_path / "lake"
    rc = pipeline.main(["--base", str(base), "--config", str(cfgfile)])
    assert rc == 0
    meta = json.loads((base / "raw" / "generation_metadata.json").read_text())
    assert meta["customers"] == 50 and meta["products"] == 20
    report = json.loads(
        (base / "reports" / "pipeline_execution_report.json").read_text()
    )
    assert report["overall_status"] == "success"


def test_pipeline_main_cli_overrides_config(spark, tmp_path):
    from ecommerce_data_pipeline_23a91a05i4_spark import pipeline

    cfgfile = tmp_path / "config.yaml"
    cfgfile.write_text("data_generation:\n  customers: 50\n")
    base = tmp_path / "lake"
    rc = pipeline.main(
        [
            "--base",
            str(base),
            "--config",
            str(cfgfile),
            "--customers",
            "31",
            "--transactions",
            "150",
        ]
    )
    assert rc == 0
    meta = json.loads((base / "raw" / "generation_metadata.json").read_text())
    assert meta["customers"] == 31 and meta["transactions"] == 150


def test_pipeline_atomic_gold_snapshot_publish(spark, tmp_path):
    """atomic_gold publishes the warehouse as one pointer-swapped
    snapshot: views and the monitor resolve through the pointer, a
    second run flips the pointer while the first version stays intact,
    and a non-atomic rerun on a published layout is refused."""
    import pytest as _pytest

    from ecommerce_data_pipeline_23a91a05i4_spark import pipeline
    from ecommerce_data_pipeline_23a91a05i4_spark.sources import maintenance as mt

    base = tmp_path / "lake"
    rep = pipeline.run_pipeline(spark, base, 40, 15, 120, atomic_gold=True)
    assert rep["overall_status"] == "success"
    gold = base / "gold"
    assert (gold / mt.CURRENT_POINTER).exists()
    v1 = (gold / mt.CURRENT_POINTER).read_text().strip()

    pipeline.register_gold_views(spark, base)
    n_fact = spark.table("fact_sales").count()
    assert n_fact > 0

    # second atomic build flips the pointer; v1 remains readable
    pipeline.silver_to_gold(spark, base, "2024-01-16", "2024-01-16 00:00:00", atomic=True)
    v2 = (gold / mt.CURRENT_POINTER).read_text().strip()
    assert v2 != v1
    assert spark.read.parquet(str(gold / v1 / "fact_sales")).count() == n_fact
    pipeline.register_gold_views(spark, base)  # resolves to v2
    assert spark.table("fact_sales").count() == n_fact

    # published layout refuses a mutating non-atomic write
    with _pytest.raises(ValueError, match="atomic"):
        pipeline.silver_to_gold(spark, base, "2024-01-17", atomic=False)


def test_yaml_without_pyyaml_raises_actionable_error(tmp_path, monkeypatch):
    """On a yaml-less interpreter, a real YAML config must fail with a
    message naming the missing dependency, not a bare JSONDecodeError."""
    import sys

    import pytest as _pytest

    from ecommerce_data_pipeline_23a91a05i4_spark import config as cfg

    p = tmp_path / "c.yaml"
    p.write_text("pipeline:\n  max_retries: 5\n")
    monkeypatch.setitem(sys.modules, "yaml", None)  # import yaml -> ImportError
    with _pytest.raises(ValueError, match="PyYAML is not installed"):
        cfg.load_config(p)
