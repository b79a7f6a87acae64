"""dense_sequence: distributed SERIAL semantics (operators/keys.py).

Contract: identical values to row_number().over(Window.orderBy(k)),
produced without any single-partition window over the data.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import Window
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators.keys import dense_sequence


def test_dense_sequence_matches_global_row_number(spark):
    df = spark.range(0, 10_000).select(
        # scrambled, non-contiguous order key
        (F.col("id") * 2654435761 % 1_000_003).alias("k"),
        F.col("id").alias("payload"),
    ).where(F.col("k") % 7 != 3)
    expected = df.withColumn(
        "seq", F.row_number().over(Window.orderBy("k")).cast("int")
    )
    got = dense_sequence(df, "seq", "k", parts=13, small_threshold=0)
    assert got.columns == df.columns + ["seq"]
    mismatches = (
        got.alias("g")
        .join(expected.alias("e"), "payload")
        .where(F.col("g.seq") != F.col("e.seq"))
        .count()
    )
    assert mismatches == 0
    n = df.count()
    lo, hi, distinct = got.agg(
        F.min("seq"), F.max("seq"), F.countDistinct("seq")
    ).collect()[0]
    assert (lo, hi, distinct) == (1, n, n)


def test_dense_sequence_small_path_matches(spark):
    # default small_threshold routes tiny inputs through the bounded
    # global window — values must be identical to the distributed path
    df = spark.range(0, 500).select((F.col("id") * 37 % 1009).alias("k"))
    small = dense_sequence(df, "seq", "k")
    dist = dense_sequence(df, "seq", "k", parts=7, small_threshold=0)
    assert (
        small.alias("s")
        .join(dist.alias("d"), "k")
        .where(F.col("s.seq") != F.col("d.seq"))
        .count()
        == 0
    )


def test_dense_sequence_plan_has_no_global_window(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    got = dense_sequence(df, "seq", "k", parts=8, small_threshold=0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("simple")
    plan = buf.getvalue()
    # Every window over the data must carry a partition spec; the only
    # empty-partition window allowed is the offsets prefix-sum, which runs
    # over the <=parts-row counts relation (marked by the __ds_cnt column).
    for line in plan.splitlines():
        if "Window [" in line and "windowspecdefinition(" in line:
            has_partition = "__ds_pid" in line.split("windowspecdefinition")[0] or (
                "windowspecdefinition(__ds_pid" in line
            )
            if not has_partition:
                assert "__ds_cnt" in plan.split(line)[0] or "__ds_cnt" in line
    # distributed primitives present: bucket repartition + broadcast join
    assert "hashpartitioning(__ds_pid" in plan
    assert "BroadcastHashJoin" in plan
