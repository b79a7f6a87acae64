"""Bench-scale (sf0.1) evidence for the one fact-fact shuffle join.

q2/q6/q17/q30 all join lineitem ⋈ orders on l_orderkey — the only join
in the suite where neither side broadcasts at scale.  Three layers keep
it skew-safe, each evidenced here:

1. AQE skew-join splitting is on (session.py) — asserted on the live
   session conf.
2. The join key itself cannot produce a hot reducer: l_orderkey
   multiplicity is bounded by lines-per-order (tens of rows), so a
   single key is orders of magnitude below AQE's skewed-partition
   threshold no matter how hashing assigns it — measured at sf0.1.
3. For keys that ARE pathologically hot (not this dataset), the
   plan-level fallback operators/skew.salted_join is proven
   value-identical to the plain join in
   tests/test_graph_corpus.py::test_salted_join_equals_plain_join.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table
from ecommerce_data_pipeline_23a91a05i4_spark.plans import extras

BENCH_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

needs_bench_data = pytest.mark.skipif(
    not os.path.isdir(BENCH_SF), reason=f"bench testdata missing: {BENCH_SF}"
)


def test_aqe_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


@needs_bench_data
def test_li_orders_key_distribution_within_aqe_bounds(spark):
    """No single l_orderkey can dominate a shuffle partition at bench
    scale: max key multiplicity is bounded (lines per order) and there
    are vastly more distinct keys than shuffle partitions, so the hash
    shuffle stays balanced without salting."""
    li = table(spark, BENCH_SF, "lineitem")
    n_rows = li.count()
    stats = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("max_per_key"),
            F.avg("n").alias("avg_per_key"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .collect()[0]
    )
    shuffle_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rows_per_partition = n_rows / shuffle_partitions
    # the heaviest key is a negligible slice (<1%) of an average shuffle
    # partition, so no reducer can be hot no matter how hashing lands
    assert stats.max_per_key < 0.01 * rows_per_partition, (
        f"hot key: {stats}, rows/partition={rows_per_partition:.0f}"
    )
    # far more keys than reducers -> law-of-large-numbers balance; AQE's
    # skewedPartitionFactor (5x median) can never trip on one key
    assert stats.n_keys > 100 * shuffle_partitions, stats


@needs_bench_data
def test_q17_fact_join_runs_under_aqe_at_bench_scale(spark):
    """Execute the rollup star query at sf0.1 and assert the finalized
    adaptive plan: AQE re-planned the shuffles (isFinalPlan=true with
    AQEShuffleRead) and dimension joins stayed broadcast, leaving the
    li ⋈ orders shuffle as the only fact-fact exchange."""
    df = extras.q17_revenue_rollup(spark, BENCH_SF)
    df.collect()
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan
    assert "BroadcastHashJoin" in plan  # nation/region (and customer) dims
