"""Bucketized range join: bucketing must be invisible to semantics."""

from __future__ import annotations

from ecommerce_data_pipeline_23a91a05i4_spark.operators.rangejoin import range_join


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", "p1"),   # inside iv1
            (1, "2024-01-01 02:00:00", "p2"),   # exactly at iv1 end
            (1, "2024-01-01 05:00:00", "p3"),   # in no interval
            (2, "2024-01-01 00:30:00", "p4"),   # other key, inside iv2
            (1, "2024-01-01 03:00:00", "p5"),   # inside iv3 (overlaps nothing else)
        ],
        "k int, t string, label string",
    ).selectExpr("k", "CAST(t AS TIMESTAMP) AS t", "label")
    intervals = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 02:00:00", "iv1"),
            (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00", "iv2"),
            (1, "2024-01-01 02:30:00", "2024-01-01 03:30:00", "iv3"),
        ],
        "k int, s string, e string, iv string",
    ).selectExpr("k", "CAST(s AS TIMESTAMP) AS s", "CAST(e AS TIMESTAMP) AS e", "iv")
    return points, intervals


def test_range_join_containment(spark):
    points, intervals = _frames(spark)
    out = range_join(points, intervals, on="k", point_time="t", start="s", end="e")
    got = {(r.label, r.iv) for r in out.collect()}
    assert got == {("p1", "iv1"), ("p2", "iv1"), ("p4", "iv2"), ("p5", "iv3")}


def test_bucket_width_does_not_change_results(spark):
    points, intervals = _frames(spark)
    wide = range_join(points, intervals, on="k", point_time="t", start="s", end="e",
                      bucket_width_s=86400)
    narrow = range_join(points, intervals, on="k", point_time="t", start="s", end="e",
                        bucket_width_s=60)
    w = sorted((r.label, r.iv) for r in wide.collect())
    n = sorted((r.label, r.iv) for r in narrow.collect())
    assert w == n
