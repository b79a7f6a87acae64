"""Aggregate-substitution soundness: the agg-table variants must equal
their fact-table originals on a real pipeline run, and their plans must
not touch the fact table."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from ecommerce_data_pipeline_23a91a05i4_spark.pipeline import register_gold_views
from ecommerce_data_pipeline_23a91a05i4_spark.plans import rewrite


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_top_products_substitution_is_sound(spark, pipeline_base):
    base, _ = pipeline_base
    register_gold_views(spark, base)
    got = rewrite.q1_top_products_from_agg(spark).collect()
    want = rewrite.q1_top_products_from_fact(spark).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 10

    plan = _plan(rewrite.q1_top_products_from_agg(spark))
    assert "agg_product_performance" in plan
    assert "fact_sales" not in plan  # zero fact I/O is the point
    assert plan.count("+- Scan parquet") == 1  # and no join at all


def test_daily_revenue_substitution_is_sound(spark, pipeline_base):
    base, _ = pipeline_base
    register_gold_views(spark, base)
    got = rewrite.daily_revenue_from_agg(spark).collect()
    want = rewrite.daily_revenue_from_fact(spark).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got, "empty daily series"
    assert "fact_sales" not in _plan(rewrite.daily_revenue_from_agg(spark))
