"""JDBC source/sink (sources/jdbc.py — reference S2, the database leg).

Runs against an embedded Derby database because its driver jars ship
inside pyspark; the module under test is database-agnostic (production
passes a Postgres URL + driver).  What must hold:

- write → read round trip preserves every row and type;
- a partitioned read yields the requested concurrency AND the same rows
  (range-predicate edges are where off-by-ones live);
- filters on the read-back DataFrame push into the generated SQL
  (``PushedFilters`` on the JDBCRelation scan) — the property that makes
  a post-read ``.filter`` a server-side WHERE, not a full transfer;
- predicates-based splits and query-as-relation both work;
- partial partition specs and table+query conflicts fail loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.sources import registry
from ecommerce_data_pipeline_23a91a05i4_spark.sources.jdbc import (
    derby_url,
    partition_bounds,
    read_jdbc,
    write_jdbc,
)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    """One Derby database with the smoke customer table loaded."""
    base = tmp_path_factory.mktemp("derby")
    url = derby_url(str(base / "db"))
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    write_jdbc(cust, url, "customer", mode="overwrite")
    return url, cust


def test_roundtrip_exact(spark, db):
    url, cust = db
    back = read_jdbc(spark, url, "customer")
    assert back.count() == cust.count()
    # full-row comparison: JDBC must not mangle ints, doubles, strings
    diff = back.exceptAll(cust).union(cust.exceptAll(back))
    assert diff.count() == 0
    assert dict(back.dtypes) == dict(cust.dtypes)


def test_partitioned_read_same_rows(spark, db):
    url, cust = db
    lo, hi = partition_bounds(spark, url, "customer", "c_custkey")
    assert (lo, hi) == (0, cust.count() - 1)
    part = read_jdbc(
        spark,
        url,
        "customer",
        partition_column="c_custkey",
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    # the 4 range queries must tile the key space exactly once
    assert part.count() == cust.count()
    assert part.select(F.count_distinct("c_custkey")).first()[0] == cust.count()


def test_filter_pushdown_into_jdbc_scan(spark, db):
    url, _ = db
    back = read_jdbc(spark, url, "customer").filter(F.col("c_nationkey") == 3)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan
    assert "PushedFilters" in plan and "c_nationkey" in plan


def test_predicates_split(spark, db):
    url, cust = db
    halves = read_jdbc(
        spark,
        url,
        "customer",
        predicates=[
            'MOD("c_custkey", 2) = 0',
            'MOD("c_custkey", 2) = 1',
        ],
    )
    assert halves.rdd.getNumPartitions() == 2
    assert halves.count() == cust.count()


def test_query_as_relation(spark, db):
    url, cust = db
    n = read_jdbc(
        spark,
        url,
        query='SELECT COUNT(*) AS n FROM customer',
    ).first()[0]
    assert n == cust.count()


def test_append_mode_accumulates(spark, db, tmp_path):
    url0, cust = db
    url = derby_url(str(tmp_path / "db_append"))
    write_jdbc(cust, url, "customer", mode="overwrite")
    write_jdbc(cust.limit(10), url, "customer", mode="append")
    assert read_jdbc(spark, url, "customer").count() == cust.count() + 10


def test_registry_read_write_jdbc(spark, db, tmp_path):
    _, cust = db
    url = derby_url(str(tmp_path / "db_reg"))
    registry.write(cust, "jdbc", url, mode="overwrite", table="customer")
    back = registry.read(spark, "jdbc", url, table="customer")
    assert back.count() == cust.count()


def test_invalid_specs_fail_loudly(spark, db):
    url, _ = db
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, url)
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, url, "customer", query="SELECT 1 FROM customer")
    with pytest.raises(ValueError, match="partial spec"):
        read_jdbc(spark, url, "customer", partition_column="c_custkey")
    with pytest.raises(ValueError, match="exclusive"):
        read_jdbc(
            spark,
            url,
            "customer",
            partition_column="c_custkey",
            lower_bound=0,
            upper_bound=10,
            num_partitions=2,
            predicates=["1=1"],
        )
    with pytest.raises(ValueError, match="table="):
        registry.write(spark.range(1), "jdbc", url, mode="append")
