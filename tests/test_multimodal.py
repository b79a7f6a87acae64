"""Multimodal plumbing: schema stability, Arrow batching, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table
from ecommerce_data_pipeline_23a91a05i4_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def _assets(spark):
    docs = table(spark, SF, "documents")
    return mm.documents_as_assets(docs)


def test_assets_schema(spark):
    a = _assets(spark)
    assert [f.name for f in a.schema.fields] == ["asset_id", "modality", "content", "metadata"]
    assert a.schema["content"].dataType.typeName() == "binary"


def test_content_sha_is_stable_dedup_key(spark):
    a = mm.with_content_sha(_assets(spark))
    n = a.count()
    assert a.select("content_sha").distinct().count() == n  # corpus has no binary dups
    twice = mm.with_content_sha(_assets(spark))
    assert a.orderBy("asset_id").select("content_sha").collect() == \
        twice.orderBy("asset_id").select("content_sha").collect()


def test_extract_features_fake_mode(spark):
    feats = mm.extract_features(_assets(spark), fake=True)
    rows = feats.orderBy("asset_id").limit(5).collect()
    assert all(len(r.features) == mm.FEATURE_DIM for r in rows)
    assert all(r.decode_width and 64 <= r.decode_width < 256 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    again = mm.extract_features(_assets(spark), fake=True).orderBy("asset_id").limit(5).collect()
    assert rows == again  # deterministic


def test_decode_stub_raises_without_fake(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")
    # and the error propagates through the real mapInPandas path
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.extract_features(_assets(spark), fake=False).limit(1).collect()


def test_frame_sampling_plan():
    assert mm.frame_sample_offsets(3500, 1000) == [0, 1000, 2000, 3000]
    assert mm.frame_sample_offsets(0) == []
