"""Structured Streaming: the streaming plans must agree with their batch
twins (q15/q16) when the stream is fully drained."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.plans import monitoring
from ecommerce_data_pipeline_23a91a05i4_spark.streaming import ingest as st

SF = "/root/testdata/sf0.001"
EVENTS = f"{SF}/events.parquet"


def test_hourly_counts_match_batch_twin(spark):
    stream = st.stream_events(spark, EVENTS)
    assert stream.isStreaming
    got = st.run_available_now(st.hourly_event_counts(stream), "hourly_t")
    batch = monitoring.q15_hourly_events(spark, SF)
    g = {
        (r.window_start, r.event_type): r.event_count
        for r in got.collect()
    }
    b = {
        (r.window_start, r.event_type): r.event_count
        for r in batch.collect()
    }
    assert g == b


def test_sessionize_stream_matches_batch_twin(spark):
    stream = st.stream_events(spark, EVENTS)
    got = st.run_available_now(st.sessionize_stream(stream), "sessions_t")
    # update-mode memory sink may hold one row per user per batch; the
    # availableNow drain is one batch here, so rows are final
    g = {r.user_id: (r.n_sessions, r.n_events) for r in got.collect()}
    batch = monitoring.q16_user_sessions(spark, SF)
    b = {r.user_id: (r.n_sessions, r.n_events) for r in batch.collect()}
    assert g == b


def test_watermark_present_in_plan(spark):
    stream = st.stream_events(spark, EVENTS)
    agg = st.hourly_event_counts(stream, watermark="2 hours")
    assert "watermark" in agg._jdf.queryExecution().analyzed().toString().lower()


def test_builtin_session_window_agrees_with_lag_based(spark):
    """Spark's built-in session_window must produce the same per-user
    session counts as the hand-rolled lag+cumsum batch operator (q16) —
    cross-validation of the 30-minute gap semantics."""
    from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table

    events = table(spark, SF, "events")
    sw = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    got = {r.user_id: (r.n_sessions, r.n_events) for r in sw.collect()}
    batch = monitoring.q16_user_sessions(spark, SF)
    want = {r.user_id: (r.n_sessions, r.n_events) for r in batch.collect()}
    assert got == want


def test_stream_to_bronze_matches_batch_content(spark, tmp_path):
    """Streaming bronze ingest drains the file stream into parquet with
    audit columns; content equals the batch read."""
    from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table

    stream = st.stream_events(spark, EVENTS)
    dst = str(tmp_path / "bronze_events")
    st.stream_to_bronze(stream, dst, str(tmp_path / "ckpt"))

    got = spark.read.parquet(dst)
    batch = table(spark, SF, "events")
    assert got.count() == batch.count()
    assert {"loaded_at", "_batch_id"} <= set(got.columns)
    g = {r.event_id for r in got.select("event_id").collect()}
    b = {r.event_id for r in batch.select("event_id").collect()}
    assert g == b
