"""Portable HyperLogLog sketch (operators/sketch.py).

The t67 gate proves cross-engine bit-identity of the estimator; these
pin the numeric contracts the gate can't see: accuracy vs exact at real
precisions, the lossless-merge algebra, the linear-counting branch,
bounded register cardinality, NULL semantics, and partitioning
independence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators import sketch as sk

SF_SMOKE = "/root/testdata/sf0.001"


def _li(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")


@pytest.mark.parametrize("hash", ["xx", "md5"])
def test_accuracy_vs_exact(spark, hash):
    """p=12 (~1.6% sigma): estimate within 5% of the exact count, on
    BOTH hash paths (fast xxhash64 and portable md5)."""
    li = _li(spark)
    exact = {
        (r.l_returnflag, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    est = {
        r.l_returnflag: r.approx_distinct
        for r in sk.approx_count_distinct_portable(
            li, ["l_partkey"], ["l_returnflag"], p=12, hash=hash
        ).collect()
    }
    for flag, n in exact:
        assert abs(est[flag] - n) / n < 0.05, (flag, n, est[flag])


def test_merge_is_lossless(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — register-exact,
    the property that makes sketches composable across shards."""
    li = _li(spark)
    g = ["l_returnflag"]
    halves = [
        sk.hll_registers(
            li.filter(F.col("l_orderkey") % 2 == i), ["l_partkey"], g, p=8
        )
        for i in (0, 1)
    ]
    merged = sk.hll_merge(*halves, group_by=g)
    full = sk.hll_registers(li, ["l_partkey"], g, p=8)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_register_rows_are_bounded(spark):
    """At most 2^p register rows per group regardless of cardinality —
    the shuffle-size contract."""
    li = _li(spark)
    counts = (
        sk.hll_registers(li, ["l_partkey"], ["l_returnflag"], p=4)
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    assert counts and all(r["count"] <= 16 for r in counts)


def test_linear_counting_branch(spark):
    """Tiny cardinality vs many registers: correction=True must route
    through linear counting and land near-exact; correction=False's
    raw harmonic estimate is badly biased there (that bias is WHY the
    published branch exists)."""
    df = spark.range(0, 30).select(F.col("id"))
    corrected = sk.approx_count_distinct_portable(df, ["id"], p=12).first()[0]
    raw = sk.approx_count_distinct_portable(
        df, ["id"], p=12, correction=False
    ).first()[0]
    assert abs(corrected - 30) / 30 < 0.1, corrected
    assert raw > corrected  # harmonic overshoots at tiny cardinality


def test_null_rows_are_ignored(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "a"), (2, "a"), (None, "b")],
        "v long, g string",
    )
    out = {
        r.g: r.approx_distinct
        for r in sk.approx_count_distinct_portable(
            df, ["v"], ["g"], p=8
        ).collect()
    }
    assert "b" not in out  # all-NULL group: no registers at all
    assert abs(out["a"] - 2) < 0.5


def test_partitioning_independence(spark):
    li = _li(spark)
    a = sorted(
        tuple(r)
        for r in sk.approx_count_distinct_portable(
            li, ["l_partkey"], ["l_returnflag"], p=8
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in sk.approx_count_distinct_portable(
            li.repartition(13), ["l_partkey"], ["l_returnflag"], p=8
        ).collect()
    )
    assert a == b


def test_p_validation_is_loud(spark):
    li = _li(spark)
    for bad in (3, 6, 20):
        with pytest.raises(ValueError, match="multiple of 4"):
            sk.hll_registers(li, ["l_partkey"], p=bad)
    with pytest.raises(ValueError, match="unknown hash"):
        sk.hll_registers(li, ["l_partkey"], hash="sha9")


def test_plan_is_jvm_side_with_partial_agg(spark):
    """The sketch must stay whole-stage-codegen'd: no Python UDFs, and
    the register build must show map-side partial aggregation (the
    term that caps the shuffle at m rows per group per partition)."""
    import io
    from contextlib import redirect_stdout

    li = _li(spark)
    df = sk.approx_count_distinct_portable(
        li, ["l_partkey"], ["l_returnflag"], p=12
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan
