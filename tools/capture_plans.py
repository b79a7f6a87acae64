"""Capture .explain('formatted') output for a set of declared queries into
plans/r12/<query>_<tag>.txt — the optimization-round evidence files
(judge-checkable plan claims; see OPTIMIZATION_r12.md).

Usage: python tools/capture_plans.py <tag> [query ...]
Defaults to the headline suite + the hot pure-plan gates.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from ecommerce_data_pipeline_23a91a05i4_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q1_top_products", "q2_monthly_trend", "q3_customer_segmentation",
    "q4_category_performance", "q5_payment_distribution", "q6_geo_revenue",
    "q7_customer_lifetime_value", "q8_product_profitability",
    "q9_dow_pattern", "q10_discount_impact",
    # hot / representative non-headline gates whose fn() is pure plan
    "q22b_price_percentiles_windowed", "q27_order_date_spine",
    "q28_nation_balance_outliers", "t3_quality_score", "t8_minhash_lsh",
    "t9_simhash", "t15_winnow_dedup", "t20_tfidf_top_terms",
    "t26_bpe_token_stats", "t27_sequence_packing", "t28_shard_assignment",
    "t39_unigram_fluency", "t44_semdedup", "t7b_embedding_neardup_lsh",
    "t101_bm25_topk_pruned",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
