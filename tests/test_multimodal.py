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


def test_decode_real_mode_fails_loudly_on_bad_input(spark):
    """fake=False must never silently fall back to stub numbers: without
    Pillow it raises NotImplementedError; with Pillow, garbage bytes
    raise the decoder's error."""
    if mm._PILImage is None:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG...")
        err = "NotImplementedError|codec"
    else:
        with pytest.raises(Exception):
            mm.decode_image(b"\x89PNG...")  # truncated, undecodable
        err = "cannot identify|Unidentified|image"
    # and the error propagates through the real mapInPandas path
    with pytest.raises(Exception, match=err):
        mm.extract_features(_assets(spark), fake=False).limit(1).collect()


def test_decode_image_real_codec_contract():
    """With Pillow importable, fake=False decodes a real PNG and returns
    the SAME contract as the stub (width/height/channels/pixel_checksum),
    with true dimensions and a checksum stable across calls.  Skipped
    where Pillow is absent (this container)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    im = PIL_Image.new("RGB", (20, 10), (255, 0, 0))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    png = buf.getvalue()

    out = mm.decode_image(png, fake=False)
    assert set(out) == {"width", "height", "channels", "pixel_checksum"}
    assert (out["width"], out["height"], out["channels"]) == (20, 10, 3)
    assert out == mm.decode_image(png, fake=False)
    # and it is NOT the stub's hash-derived pseudo-decode
    assert out != mm.decode_image(png, fake=True)


def test_frame_sampling_plan():
    assert mm.frame_sample_offsets(3500, 1000) == [0, 1000, 2000, 3000]
    assert mm.frame_sample_offsets(0) == []


def test_resize_images_deterministic_and_schema_stable(spark):
    a = _assets(spark).limit(20)
    r1 = mm.resize_images(a, 256, 128).orderBy("asset_id").collect()
    r2 = mm.resize_images(a, 256, 128).orderBy("asset_id").collect()
    assert r1 == r2  # content-hash-derived payloads are run-stable
    expected_len = 32 + (256 * 128 * 3) // 4096
    assert all(r.n_bytes == expected_len == len(r.content) for r in r1)
    assert all((r.width, r.height) == (256, 128) for r in r1)
    # different target size -> different payloads (dims are in the hash)
    other = mm.resize_images(a, 64, 64).orderBy("asset_id").collect()
    assert all(x.content != y.content for x, y in zip(r1, other))


def test_sample_video_frames_matches_offset_plan(spark):
    docs = table(spark, SF, "documents").limit(30)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("modality"),
        F.col("text").cast("binary").alias("content"),
        F.create_map(
            F.lit("duration_ms"), (F.col("n_chars") * 10).cast("string")
        ).alias("metadata"),
    )
    frames = mm.sample_video_frames(assets, every_ms=2000).collect()
    durations = {r.doc_id: r.n_chars * 10 for r in docs.collect()}
    by_asset: dict[int, list[int]] = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r.frame_offset_ms)
        assert r.n_bytes == 32 == len(r.frame)
    for aid, dur in durations.items():
        expect = mm.frame_sample_offsets(dur, 2000)
        assert sorted(by_asset.get(aid, [])) == expect, aid


def test_audio_decode_stub_gating():
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"abc")
    d1, d2 = mm.decode_audio(b"abc", fake=True), mm.decode_audio(b"abc", fake=True)
    assert d1 == d2 and d1["sample_rate"] in (8000, 16000, 44100, 48000)


def test_resize_without_fake_raises(spark):
    a = _assets(spark).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.resize_images(a, 32, 32, fake=False).collect()
