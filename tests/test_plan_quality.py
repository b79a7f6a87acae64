"""Physical-plan assertions — the 100 TB design contract.

Correctness tests say the answers are right; these say the *plans* are the
ones that survive a 1000-executor scale-up: filters reach the parquet
scan, projections prune columns, dimension joins broadcast, and hot-path
operators stay inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table
from ecommerce_data_pipeline_23a91a05i4_spark.plans import analytics, llmdata

SF = "/root/testdata/sf0.001"


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    li = table(spark, SF, "lineitem")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = explain_str(q)
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_scan(spark):
    li = table(spark, SF, "lineitem")
    q = li.select("l_orderkey", "l_extendedprice")
    plan = explain_str(q)
    # ReadSchema must carry only the projected columns, not all 11
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_shipdate" not in read_schema and "l_comment" not in read_schema


def test_dim_join_is_broadcast(spark):
    plan = explain_str(analytics.q1_top_products(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # part is dimension-sized


def test_geo_star_join_broadcasts_all_dims(spark):
    plan = explain_str(analytics.q6_geo_revenue(spark, SF))
    # customer/nation/region joins must all be broadcast at this SF
    assert plan.count("BroadcastHashJoin") >= 3


def test_hot_paths_have_no_python_udfs(spark):
    for fn in (
        analytics.q1_top_products,
        analytics.q9_dow_pattern,
        llmdata.t1_text_stats,
        llmdata.t5_ngram_jaccard,
        llmdata.t6_knn_cosine,
        llmdata.t9_simhash,
    ):
        plan = explain_str(fn(spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, fn.__name__


def test_wholestage_codegen_covers_agg(spark):
    # Codegen stages only appear in the AQE *final* plan (after an action),
    # marked with '*(n)' in simple mode.  Partial aggregation must also be
    # present (map-side combine before the exchange).
    df = analytics.q4_category_performance(spark, SF)
    df.collect()
    plan = explain_str(df, "simple")
    assert "isFinalPlan=true" in plan
    assert "*(" in plan  # whole-stage codegen stages exist
    assert "partial_sum" in plan  # map-side combine before shuffle


def test_topk_uses_take_ordered(spark):
    plan = explain_str(analytics.q1_top_products(spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan  # O1: top-k, not global sort


def test_silver_transactions_partition_pruning(spark, pipeline_base):
    """Month-partitioned silver transactions: a month-range filter must
    prune partitions at the scan (the lakehouse analog of the reference's
    idx_transactions_date index)."""
    base, _ = pipeline_base
    df = spark.read.parquet(str(base / "silver" / "transactions"))
    q = df.filter(F.col("txn_month") == "2023-05")
    plan = explain_str(q)
    assert "PartitionFilters" in plan and "txn_month" in plan
    line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "2023-05" in line
