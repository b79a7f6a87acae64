"""As-of join — the time-series operator Spark lacks natively.

``asof_join(left, right, ...)`` pairs each left row with the most recent
right row at or before its timestamp, per key.  Implemented with the
union-sort-window technique rather than a range join:

    tag both sides → union → one sort per key on (time, side) →
    last(right attrs, ignoreNulls) over an unbounded-preceding window →
    keep the left rows

This is the 100 TB-correct shape: ONE shuffle on the key (the window
sort), linear in |left|+|right| — a naive `t_left >= t_right` range join
is a per-key cross product that Catalyst can only nest-loop.  Right rows
sort before left rows at equal timestamps, giving the standard
"at or before" (>=) semantics.

Oracle twin: DuckDB's native ASOF JOIN (used by the t12 gate query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
) -> DataFrame:
    """Columns: all of ``left`` + the as-of matched ``right_values``
    (NULL when no right row precedes the left row's time)."""
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_values],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_left"].dataType).alias("_left"),
        *[F.col(c) for c in right_values],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionAll(r_tag).select(
        "_is_left",
        "_left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_values],
    )
    out = merged.filter(F.col("_is_left") == 1)
    return out.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *right_values,
    )
