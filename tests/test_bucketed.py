"""Bucketed co-located joins: same results, no shuffle.

The reference indexes its join keys (create_production_schema.sql:96-107);
the lakehouse analog is bucketing (SURVEY.md §4).  These tests pin the
scale contract: a join of two tables bucketed on the join key plans NO
Exchange on either side, while the same join over plain parquet shuffles
both — and the answers are identical either way.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from ecommerce_data_pipeline_23a91a05i4_spark.sources.registry import write_bucketed

SF = "/root/testdata/sf0.001"
BUCKETS = 8


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "okey"),
        "b_lineitem", str(base / "b_lineitem"), "okey", BUCKETS,
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"),
        "b_orders", str(base / "b_orders"), "okey", BUCKETS,
    )
    yield li, orders
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge so shuffle behavior is what's under test."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_plans_no_exchange(spark, bucketed_tables, no_broadcast):
    j = spark.table("b_lineitem").join(spark.table("b_orders"), "okey")
    plan = explain_str(j)
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") == 2


def test_plain_join_shuffles_both_sides(spark, bucketed_tables, no_broadcast):
    li, orders = bucketed_tables
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert explain_str(j, "simple").count("Exchange hashpartitioning") >= 2


def test_bucketed_join_matches_plain_join(spark, bucketed_tables, no_broadcast):
    li, orders = bucketed_tables
    bucketed = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), "okey")
        .groupBy("o_orderstatus")
        .count()
    )
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    from pyspark.sql import functions as F

    # The planner's auto-bucketed-scan heuristic falls back to a plain scan
    # for a filter-only query (no join/agg wants the distribution); pin the
    # bucketed scan to observe the point-lookup pruning it enables.
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        q = spark.table("b_orders").filter(F.col("okey") == 7)
        assert f"SelectedBucketsCount: 1 out of {BUCKETS}" in explain_str(q)
    finally:
        spark.conf.set(conf, prev)
