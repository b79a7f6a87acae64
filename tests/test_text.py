"""Text operators on adversarial inputs (the oracle-parity test covers the
bulk corpus; these pin the edge semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators import text as tx


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["t"]).select(col.alias("v")).collect()[0].v


def test_token_count_collapses_whitespace(spark):
    assert _one(spark, "  a\t\tb \n c  ", tx.token_count(F.col("t"))) == 3


def test_lang_id_marker_votes(spark):
    assert _one(spark, "the cat is on the mat", tx.predicted_lang(F.col("t"))) == "en"
    assert _one(spark, "der hund ist nicht hier und das ist gut", tx.predicted_lang(F.col("t"))) == "de"
    assert _one(spark, "le chat est dans la maison pour dormir", tx.predicted_lang(F.col("t"))) == "fr"
    assert _one(spark, "你好 世界 这是 中文", tx.predicted_lang(F.col("t"))) == "zh"
    # tie (no markers at all) → priority order → en
    assert _one(spark, "xyzzy plugh", tx.predicted_lang(F.col("t"))) == "en"


def test_fingerprint_normalization_invariance(spark):
    a = _one(spark, "Hello  World", tx.content_fingerprint(F.col("t")))
    b = _one(spark, "  hello world ", tx.content_fingerprint(F.col("t")))
    assert a == b


def test_bag_fingerprint_order_invariance(spark):
    a = _one(spark, "alpha beta gamma", tx.bag_fingerprint(F.col("t")))
    b = _one(spark, "gamma alpha beta beta", tx.bag_fingerprint(F.col("t")))
    assert a == b


def test_quality_grades_monotonic(spark):
    rich = ("the data pipeline is a thing of beauty and the team that built "
            "it is proud of the care that went in. " * 3)
    poor = "x!!!!???..."
    qs = tx.quality_score(F.col("t"))
    assert _one(spark, rich, qs) > _one(spark, poor, qs)
    assert _one(spark, poor, tx.quality_grade(qs)) in ("C", "D")
