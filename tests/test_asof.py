"""as-of join semantics on constructed data (the t12 gate covers the bulk
corpus; these pin the edges)."""

from __future__ import annotations

from ecommerce_data_pipeline_23a91a05i4_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, "e1"), (1, 5, "e2"), (1, 3, "e3"), (2, 10, "e4")],
        "k int, t int, label string",
    )
    right = spark.createDataFrame(
        [(1, 3, 30), (1, 4, 40), (3, 1, 99)],
        "k int, t int, v int",
    )
    return left, right.withColumnRenamed("v", "asof_v").withColumnRenamed("t", "rt")


def test_asof_basic_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="rt",
                    right_values=["asof_v"])
    rows = {r.label: r.asof_v for r in out.collect()}
    assert rows["e1"] is None      # before any right row
    assert rows["e3"] == 30        # exactly at t=3 → >= matches the t=3 row
    assert rows["e2"] == 40        # most recent of {3,4}
    assert rows["e4"] is None      # key 2 has no right rows at all


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="rt",
                    right_values=["asof_v"])
    assert out.count() == left.count()
    assert set(out.columns) == {"k", "t", "label", "asof_v"}
