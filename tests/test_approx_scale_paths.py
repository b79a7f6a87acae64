"""Approximate aggregates — the documented 100 TB swap-ins for exact
countDistinct (A2) and exact percentile (q22).  They have no cross-engine
oracle (sketches are engine-specific), so their error CONTRACTS are
pinned here instead: the approximation must land within its configured
bound of the exact answer on real gate-scale data, and must be
deterministic run-to-run (mergeable sketches, no sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table
from ecommerce_data_pipeline_23a91a05i4_spark.functions.exprs import approx_distinct

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = table(spark, SF, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        approx_distinct(F.col("user_id"), rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(3 * 0.02 * row.exact, 1)

    # grouped form: per event_type, same bound
    rows = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        approx_distinct(F.col("user_id"), rsd=0.02).alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r.approx - r.exact) <= max(3 * 0.02 * r.exact, 1), r


def test_approx_count_distinct_is_deterministic(spark):
    ev = table(spark, SF, "events")
    q = ev.groupBy("event_type").agg(
        approx_distinct(F.col("user_id")).alias("a")
    )
    # same sketch under a different partitioning: HLL merge is exact
    q2 = ev.repartition(7).groupBy("event_type").agg(
        approx_distinct(F.col("user_id")).alias("a")
    )
    a = sorted((r.event_type, r.a) for r in q.collect())
    b = sorted((r.event_type, r.a) for r in q2.collect())
    assert a == b


def test_approx_percentile_within_rank_error(spark):
    """approx_percentile's accuracy parameter bounds RANK error: the
    returned value must be an actual data value whose rank is within
    n/accuracy of the target rank."""
    orders = table(spark, SF, "orders")
    acc = 1000
    row = orders.agg(
        F.expr(f"approx_percentile(o_totalprice, 0.5, {acc})").alias("ap"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    below = orders.filter(F.col("o_totalprice") <= row.ap).count()
    target = row.n * 0.5
    assert abs(below - target) <= row.n / acc + 1, (below, target, row.n)
