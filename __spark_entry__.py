"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator for the
driver's DuckDB hash-comparison at sf0.01 (see SURVEY.md §2 for the
operator inventory each query covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_data_pipeline_23a91a05i4_spark.plans import (
    analytics,
    behavioral,
    corpus,
    extras,
    llmdata,
    monitoring,
    relational,
)
from ecommerce_data_pipeline_23a91a05i4_spark.plans.oracles import (
    ANALYTICS_ORACLES,
    BEHAVIORAL_ORACLES,
    CORPUS_ORACLES,
    EXTRAS_ORACLES,
    LLMDATA_ORACLES,
    MONITORING_ORACLES,
    RELATIONAL_ORACLES,
)
from ecommerce_data_pipeline_23a91a05i4_spark.plans.static_oracles import (
    STATIC_ORACLES,
)
from ecommerce_data_pipeline_23a91a05i4_spark.session import (
    ensure_session_defaults,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (top products by revenue) on /root/testdata/sf0.001."""
    ensure_session_defaults(spark)
    return analytics.q1_top_products(spark, "/root/testdata/sf0.001")


def _wrap(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Normalize the (possibly driver-owned) session before building the
    plan — the one sanctioned conf touch-point; see session.py."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_session_defaults(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _QUERIES.items()}


# Registry order IS a rotation schedule: the driver's correctness run
# checks the first 50 entries only, so gates with the least cumulative
# driver evidence must come first.  Round-12 ordering (the plan the
# r11 verdict signed off as next #3): (00) the three new round-12
# gates (zero driver evidence); (a) the twelve gates whose last driver
# evidence is r8 — t30/q1/q2/t55-t60/t54b/s2c/t62, the oldest left in
# the registry; (b) the oldest r9/r10-evidence gates filling the
# window to 50.  INVARIANT (the honest form): with 165 gates and a
# 50-slot window, full-registry driver freshness cycles every
# ceil(165/50) = 4 rounds — at any time the oldest evidence is at most
# ~3 rounds old, NOT at most one.  The all-gate pytest twin
# (tests/test_oracle_parity.py) runs every session regardless.
_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # -- WINDOW (first 50 = this round's driver check) ---------------
        # (00) new ROUND-12 gates: zero driver evidence, head of window
        "t100_ann_index": llmdata.t100_ann_index,
        "t101_bm25_topk_pruned": corpus.t101_bm25_topk_pruned,
        "t102_mjpeg_frame_decode": corpus.t102_mjpeg_frame_decode,
        # (a) the twelve r8-evidence leftovers (VERDICT r11 next #3 —
        # the oldest driver evidence in the registry)
        "t30_corpus_integrity": monitoring.t30_corpus_integrity,
        "q1_top_products": analytics.q1_top_products,
        "q2_monthly_trend": analytics.q2_monthly_trend,
        "t55_txtable_delete": llmdata.t55_txtable_delete,
        "t56_dedup_index_cascade": llmdata.t56_dedup_index_cascade,
        "t57_bpe_batched": llmdata.t57_bpe_batched,
        "t54b_duplicate_spans_prescreened": (
            llmdata.t54b_duplicate_spans_prescreened
        ),
        "s2c_session_window_append": monitoring.s2c_session_window_append,
        "t58_html_extract": llmdata.t58_html_extract,
        "t59_card_pii": llmdata.t59_card_pii,
        "t60_classifier_training": llmdata.t60_classifier_training,
        "t62_txtable_data_skipping": llmdata.t62_txtable_data_skipping,
        # (b) r9/r10-evidence body, filling the window to 50
        "t93_log_checkpointing": llmdata.t93_log_checkpointing,
        "t94_bm25_query_relation": corpus.t94_bm25_query_relation,
        "s19_streaming_outer_interval_join": (
            monitoring.s19_streaming_outer_interval_join
        ),
        "t95_fuzzy_join": llmdata.t95_fuzzy_join,
        "t96_merge_schema_evolution": llmdata.t96_merge_schema_evolution,
        "t97_copy_into": llmdata.t97_copy_into,
        "t16_deterministic_sample": extras.t16_deterministic_sample,
        "t17_minhash_portable": extras.t17_minhash_portable,
        "t18_simhash_portable": extras.t18_simhash_portable,
        "t19_winnow_portable": extras.t19_winnow_portable,
        "t1_text_stats": llmdata.t1_text_stats,
        "t2_lang_id": llmdata.t2_lang_id,
        "t3_quality_score": llmdata.t3_quality_score,
        "t4_dedup_exact": llmdata.t4_dedup_exact,
        "t5_ngram_jaccard": llmdata.t5_ngram_jaccard,
        "t6_knn_cosine": llmdata.t6_knn_cosine,
        "t7_embedding_neardup": llmdata.t7_embedding_neardup,
        "q17_revenue_rollup": extras.q17_revenue_rollup,
        "q20_orders_without_items": extras.q20_orders_without_items,
        "q21_priority_pivot": extras.q21_priority_pivot,
        "q22_price_percentiles": extras.q22_price_percentiles,
        "q23_monthly_growth": relational.q23_monthly_growth,
        "q24_brand_type_cube": relational.q24_brand_type_cube,
        "q11_referential_integrity": monitoring.q11_referential_integrity,
        "q7_customer_lifetime_value": analytics.q7_customer_lifetime_value,
        "q8_product_profitability": analytics.q8_product_profitability,
        "q9_dow_pattern": analytics.q9_dow_pattern,
        "q10_discount_impact": analytics.q10_discount_impact,
        "q3_customer_segmentation": analytics.q3_customer_segmentation,
        "q4_category_performance": analytics.q4_category_performance,
        "q5_payment_distribution": analytics.q5_payment_distribution,
        "q6_geo_revenue": analytics.q6_geo_revenue,
        "t44_semdedup": llmdata.t44_semdedup,
        "t61_semdedup_incremental": llmdata.t61_semdedup_incremental,
        "s7_streaming_semdedup": monitoring.s7_streaming_semdedup,
        # ---- driver window ends after the 50th entry above ------------
        # ROUND-13 PLAN: the remaining r9/r10-evidence body below
        # heads the next window; the r11-checked 50 at the bottom
        # are the freshest and rotate up last.  The all-gate pytest
        # twin (tests/test_oracle_parity.py) covers every entry
        # every session regardless.
        # (c) remaining r9/r10-evidence body — next round's head
        "t70b_cms_heavy_hitter_set": llmdata.t70b_cms_heavy_hitter_set,
        "t73_zordered_compaction": llmdata.t73_zordered_compaction,
        "s10_streaming_cdc_matview": monitoring.s10_streaming_cdc_matview,
        "s11_streaming_cms_sketch": monitoring.s11_streaming_cms_sketch,
        "s12_streaming_hist_quantiles": (
            monitoring.s12_streaming_hist_quantiles
        ),
        "t74_grouped_hist_quantiles": extras.t74_grouped_hist_quantiles,
        "t75_event_transitions": behavioral.t75_event_transitions,
        "s13_streaming_heavy_hitters": monitoring.s13_streaming_heavy_hitters,
        "s14_streaming_exact_dedup": monitoring.s14_streaming_exact_dedup,
        "t44b_semdedup_sampled_training": (
            llmdata.t44b_semdedup_sampled_training
        ),
        "q35_market_basket": relational.q35_market_basket,
        "t77_shallow_clone": llmdata.t77_shallow_clone,
        "t33_repetition_filters": llmdata.t33_repetition_filters,
        "t34_decontamination": llmdata.t34_decontamination,
        "t35_sliding_chunks": corpus.t35_sliding_chunks,
        "s16_streaming_change_feed": monitoring.s16_streaming_change_feed,
        "t82_filtered_ann": llmdata.t82_filtered_ann,
        "t83_commit_invariants": llmdata.t83_commit_invariants,
        "t84_bigram_fluency": llmdata.t84_bigram_fluency,
        "t85_deletion_vectors": llmdata.t85_deletion_vectors,
        "s17_streaming_interval_join": monitoring.s17_streaming_interval_join,
        "t86_bm25_retrieval": corpus.t86_bm25_retrieval,
        "t87_optimize_small": llmdata.t87_optimize_small,
        "s18_streaming_enrichment": monitoring.s18_streaming_enrichment,
        "t89_bloom_point_lookup": llmdata.t89_bloom_point_lookup,
        "t90_analyze_stats": llmdata.t90_analyze_stats,
        "t91_generated_columns": llmdata.t91_generated_columns,
        "t92_quarantine_append": llmdata.t92_quarantine_append,
        "t57b_bpe_sampled": llmdata.t57b_bpe_sampled,
        "t62b_txtable_multicol_skipping": (
            llmdata.t62b_txtable_multicol_skipping
        ),
        "t63_takedown_lifecycle": llmdata.t63_takedown_lifecycle,
        "t64_jdbc_roundtrip": extras.t64_jdbc_roundtrip,
        "t65_quantized_knn": llmdata.t65_quantized_knn,
        "t66_txtable_cdc_merge": llmdata.t66_txtable_cdc_merge,
        "t67_hll_distinct": extras.t67_hll_distinct,
        "t68_incremental_matview": llmdata.t68_incremental_matview,
        "t69_quantized_ann": llmdata.t69_quantized_ann,
        "s8_streaming_distinct_sketch": (
            monitoring.s8_streaming_distinct_sketch
        ),
        "t70_cms_heavy_hitters": llmdata.t70_cms_heavy_hitters,
        "t71_hist_quantiles": extras.t71_hist_quantiles,
        "t72_schema_evolution": llmdata.t72_schema_evolution,
        "s9_streaming_cdc_apply": monitoring.s9_streaming_cdc_apply,
        "t31_incremental_minhash": llmdata.t31_incremental_minhash,
        "t32_pii_redaction": llmdata.t32_pii_redaction,
        "s2b_session_window": monitoring.s2b_session_window,
        "t41_segment_dedup": llmdata.t41_segment_dedup,
        "t42_quality_classifier": llmdata.t42_quality_classifier,
        "t43_bloom_prefilter": llmdata.t43_bloom_prefilter,
        "t45_epoch_plan": corpus.t45_epoch_plan,
        "t46_incremental_segment_dedup": llmdata.t46_incremental_segment_dedup,
        "t47_domain_filter": llmdata.t47_domain_filter,
        "t48_bpe_merges": llmdata.t48_bpe_merges,
        "t49_bpe_encode": llmdata.t49_bpe_encode,
        "t50_dataset_split": corpus.t50_dataset_split,
        "s4_streaming_exact_dedup": monitoring.s4_streaming_exact_dedup,
        "s5_streaming_curation": monitoring.s5_streaming_curation,
        "s6_streaming_txtable_sink": monitoring.s6_streaming_txtable_sink,
        "t42b_quality_classifier_table": llmdata.t42b_quality_classifier_table,
        "t51_dataset_version_diff": llmdata.t51_dataset_version_diff,
        "t52_length_profile": llmdata.t52_length_profile,
        "t53_txtable_versions": llmdata.t53_txtable_versions,
        "t54_duplicate_spans": llmdata.t54_duplicate_spans,
        "t10_token_frequencies": extras.t10_token_frequencies,
        "t11_keyword_search": extras.t11_keyword_search,
        "t13_vocab_difference": extras.t13_vocab_difference,
        # (d) driver-checked r11 (freshest evidence, rotate last)
        "t98_concurrent_writers": llmdata.t98_concurrent_writers,
        "t99_incremental_bm25_index": corpus.t99_incremental_bm25_index,
        "s20_streaming_multihop_pipeline": (
            monitoring.s20_streaming_multihop_pipeline
        ),
        "t36_temperature_mix": corpus.t36_temperature_mix,
        "t37_incremental_embedding_neardup": (
            llmdata.t37_incremental_embedding_neardup
        ),
        "s3_streaming_neardup": monitoring.s3_streaming_neardup,
        "t38_curation_v2": llmdata.t38_curation_v2,
        "t39_unigram_fluency": llmdata.t39_unigram_fluency,
        "t40_incremental_clusters": corpus.t40_incremental_clusters,
        "q26_daily_activity": relational.q26_daily_activity,
        "q31_weekly_cohort_retention": behavioral.q31_weekly_cohort_retention,
        "q32_event_funnel": behavioral.q32_event_funnel,
        "t78_column_mapping": llmdata.t78_column_mapping,
        "s15_streaming_sink_autocompact": (
            monitoring.s15_streaming_sink_autocompact
        ),
        "t79_grouped_heavy_hitters": llmdata.t79_grouped_heavy_hitters,
        "t80_product_quantization": llmdata.t80_product_quantization,
        "t81_type_widening": llmdata.t81_type_widening,
        "q33_returnflag_grouping_sets": (
            behavioral.q33_returnflag_grouping_sets
        ),
        "q34_click_purchase_overlap": behavioral.q34_click_purchase_overlap,
        "t20_tfidf_top_terms": corpus.t20_tfidf_top_terms,
        "t21_neardup_clusters": corpus.t21_neardup_clusters,
        "t22_balanced_language_sample": corpus.t22_balanced_language_sample,
        "t23_multimodal_manifest": corpus.t23_multimodal_manifest,
        "t24_multimodal_features": corpus.t24_multimodal_features,
        "t25_frame_sample": corpus.t25_frame_sample,
        "t27_sequence_packing": corpus.t27_sequence_packing,
        "t28_shard_assignment": corpus.t28_shard_assignment,
        "q25_top_parts_per_brand": relational.q25_top_parts_per_brand,
        "q27_order_date_spine": relational.q27_order_date_spine,
        "q28_nation_balance_outliers": relational.q28_nation_balance_outliers,
        "q29_lineitem_moment_stats": relational.q29_lineitem_moment_stats,
        "q30_rolling_weekly_revenue": behavioral.q30_rolling_weekly_revenue,
        "q12_duplicate_detection": monitoring.q12_duplicate_detection,
        "q13_freshness": monitoring.q13_freshness,
        "q14_volume_anomaly": monitoring.q14_volume_anomaly,
        "q15_hourly_events": monitoring.q15_hourly_events,
        "q16_user_sessions": monitoring.q16_user_sessions,
        "q18_salted_event_stats": extras.q18_salted_event_stats,
        "q19_props_json_stats": extras.q19_props_json_stats,
        "q22b_price_percentiles_windowed": (
            extras.q22b_price_percentiles_windowed
        ),
        "s1_streaming_hourly_events": monitoring.s1_streaming_hourly_events,
        "s2_streaming_sessionization": monitoring.s2_streaming_sessionization,
        "t7b_embedding_neardup_lsh": llmdata.t7b_embedding_neardup_lsh,
        "t8_minhash_lsh": llmdata.t8_minhash_lsh,
        "t9_simhash": llmdata.t9_simhash,
        "t12_event_asof_order": extras.t12_event_asof_order,
        "t14_event_session_ranges": extras.t14_event_session_ranges,
        "t15_winnow_dedup": extras.t15_winnow_dedup,
        "t26_bpe_token_stats": llmdata.t26_bpe_token_stats,
        "t29_curation_pipeline": llmdata.t29_curation_pipeline,
}


def oracle_sql() -> dict[str, str]:
    """Every query has an oracle, in one of two strengths:

    - computed ANSI-SQL twins (most entries): DuckDB recomputes the
      result from the raw tables — fully independent.
    - static-expected pins (t8/t9/t15/t24 — seeded-xxhash64 or
      Python-encoder based, which DuckDB cannot recompute): literal
      VALUES generated by tools/gen_static_oracles.py, guarded by a
      corpus checksum so stale expectations fail loudly.  On their own
      these are regression pins, not independent verification; their
      independence comes from tests/test_static_oracle_independence.py,
      which recomputes the same expected rows with a pure-Python XXH64
      and from-scratch pipeline twins, plus the md5 variants t17/t18/
      t19 whose full computed oracles prove the same algorithms, and
      test_multimodal.py pinning t24's encoder determinism."""
    out = dict(ANALYTICS_ORACLES)
    out.update(MONITORING_ORACLES)
    out.update(LLMDATA_ORACLES)
    out.update(EXTRAS_ORACLES)
    out.update(RELATIONAL_ORACLES)
    out.update(BEHAVIORAL_ORACLES)
    out.update(CORPUS_ORACLES)
    out.update(STATIC_ORACLES)
    return out
