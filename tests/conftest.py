from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ecommerce_data_pipeline_23a91a05i4_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def pipeline_base(spark, tmp_path_factory):
    """One small end-to-end pipeline run shared by the pipeline tests."""
    from ecommerce_data_pipeline_23a91a05i4_spark.pipeline import run_pipeline

    base = tmp_path_factory.mktemp("lakehouse")
    report = run_pipeline(
        spark, base, n_customers=60, n_products=40, n_transactions=300
    )
    return base, report
