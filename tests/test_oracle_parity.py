"""Every oracle-checked driver query hash-matches DuckDB at sf0.001 —
the in-repo version of the driver's CORRECTNESS gate (tools/compare.py is
the interactive twin)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod
from tools.compare import compare_one, duck_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    problems = compare_one(spark, duck, name, QUERIES[name], ORACLES.get(name), SF)
    real = [p for p in problems if not p.startswith("(rows-only)")]
    assert not real, problems


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["product_name", "brand", "total_revenue", "units_sold", "avg_price"]
