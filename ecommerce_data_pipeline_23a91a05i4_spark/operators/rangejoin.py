"""Bucketized range (interval) join.

``range_join(points, intervals, ...)`` assigns each point row to the
interval rows that contain it (same key, start <= t <= end).  A naive
non-equi join degenerates to a per-key nested loop; the scale
implementation bucketizes time:

    1. each interval explodes to the fixed-width buckets it covers
    2. points equi-join on (key, bucket)   ← ONE hash join, prunable
    3. the exact BETWEEN predicate filters the candidates

Join work becomes O(points + intervals · avg_buckets_per_interval), and
the bucket width is the tuning dial (wider = fewer exploded rows, more
false candidates).  This is the same trick DuckDB/Trino apply internally
for range joins and the standard Spark pattern for interval overlap at
scale (genomics, sessionization, SCD lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_time: str,
    start: str,
    end: str,
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Inner join: all columns of ``points`` + all non-key columns of
    ``intervals``, one output row per (point, containing interval)."""
    p_us = F.unix_micros(F.col(point_time))
    s_us = F.unix_micros(F.col(start))
    e_us = F.unix_micros(F.col(end))
    width = bucket_width_s * 1_000_000

    p = points.withColumn("_bucket", (p_us / width).cast("long"))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence((s_us / width).cast("long"), (e_us / width).cast("long"))
        ),
    )
    interval_cols = [c for c in intervals.columns if c != on]
    joined = p.join(i, [on, "_bucket"]).filter(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    )
    return joined.select(*points.columns, *interval_cols)
