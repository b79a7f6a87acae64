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
