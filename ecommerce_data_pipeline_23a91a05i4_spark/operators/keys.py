"""Distributed surrogate-key generation (SERIAL semantics at scale).

The reference mints surrogate keys with Postgres SERIAL columns
(sql/ddl/create_warehouse_schema.sql:10,33,69,78).  SURVEY.md §1.2 maps
that to a deterministic dense sequence ordered by the business key.

A naive ``row_number().over(Window.orderBy(k))`` is correct but funnels
the whole relation through ONE partition (Spark warns "No Partition
Defined for Window operation") — fine for dimension tables, fatal for a
fact table at 100 TB.  ``dense_sequence`` produces the same dense 1..n
numbering with no single-partition stage, the DataFrame analog of
``RDD.zipWithIndex``:

1. sample the order key (fixed seed) and derive ``parts-1`` split
   points, so the bucket id is a PURE function of the key — unlike
   ``repartitionByRange``, whose RangePartitioner samples with a
   time-based seed and therefore assigns different buckets each time
   the subtree is re-evaluated (the counts pass and the output pass
   would disagree);
2. local ``row_number`` per bucket (``Window.partitionBy(bucket)`` —
   distributed, whole-stage-codegen friendly);
3. per-bucket counts (a ≤``parts``-row aggregate) → exclusive prefix
   sums → broadcast-joined back as offsets.  Bucket boundaries are
   order-preserving, so offset + local row number == global row number.

Cost model: the distributed path reads its input four times (count, key
sample, per-bucket counts, output).  By default the input is persisted
MEMORY_AND_DISK before the first job, so an expensive upstream subtree
(e.g. the 6-way fact join) is computed ONCE and the three follow-up
passes are cache reads — the same shape ``zipWithIndex`` pays for its
count job.  Pass ``persist=False`` when the input is a cheap scan that
is better re-read than spilled (the persisted block is session-scoped;
Spark's LRU evicts it under memory pressure).  Every stage is
distributed; bucket skew is bounded by sample quality (128 samples per
bucket).  Small inputs (``small_threshold``, default 4M rows) skip all
of this and take the plain bounded global window — scheduling three
extra jobs to avoid a one-partition window over kilobytes is a net
loss; see ``dense_sequence``.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ds_pid"
_RN = "__ds_rn"
_OFF = "__ds_off"
_SAMPLES_PER_PART = 128


def _split_points(
    df: DataFrame, order: Column, parts: int, seed: int, n: int
) -> list:
    """Deterministic, order-preserving split points for ``parts`` buckets
    (may return fewer on tiny/skewed inputs; correctness never depends on
    the boundary choice, only balance does)."""
    keys = df.select(order.alias("__ds_k"))
    if n == 0 or parts <= 1:
        return []
    frac = min(1.0, (parts * _SAMPLES_PER_PART) / n)
    sample = sorted(r[0] for r in keys.sample(False, frac, seed).collect())
    if not sample:
        return []
    bnds = []
    for i in range(1, parts):
        b = sample[min(len(sample) - 1, (len(sample) * i) // parts)]
        if not bnds or b > bnds[-1]:
            bnds.append(b)
    return bnds


def dense_sequence(
    df: DataFrame,
    key_name: str,
    order_col: str | Column,
    parts: int | None = None,
    key_type: str = "int",
    seed: int = 42,
    persist: bool = True,
    small_threshold: int = 4_000_000,
) -> DataFrame:
    """Add ``key_name`` = dense 1..n sequence ordered by ``order_col``,
    without a single-partition window over large data.  Values are
    identical to ``row_number().over(Window.orderBy(order_col))``
    whenever ``order_col`` is a total order (ties may interleave
    differently, as with any row_number over a non-unique key).

    Adaptive (AQE-style): inputs at or under ``small_threshold`` rows
    take the plain global window — one partition holding <=4M narrow
    rows is bounded and strictly cheaper than the three extra jobs the
    distributed path schedules.  Above it, the bucketed path runs; the
    threshold never triggers at fact scale.  Set ``small_threshold=0``
    to force the distributed path (tests do)."""
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    if parts is None:
        parts = df.sparkSession.sparkContext.defaultParallelism
    if persist and not df.is_cached:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    n = df.count()
    if n <= small_threshold:
        return df.withColumn(
            key_name,
            F.row_number().over(Window.orderBy(order)).cast(key_type),
        )
    bnds = _split_points(df, order, parts, seed, n)
    if bnds:
        # bucket id = number of split points <= key: deterministic,
        # monotone in the key, identical in every re-evaluation.  A plain
        # comparison chain (no higher-order lambda) stays valid when the
        # optimizer re-derives the expression across aggregate boundaries.
        pid = sum(
            ((order >= F.lit(b)).cast("int") for b in bnds), F.lit(0)
        )
    else:
        pid = F.lit(0)
    with_pid = df.withColumn(_PID, pid)
    local = with_pid.repartition(max(1, len(bnds) + 1), F.col(_PID)).withColumn(
        _RN, F.row_number().over(Window.partitionBy(_PID).orderBy(order))
    )
    # Tiny relation: one row per bucket.  The exclusive prefix sum's
    # single-partition window is over ≤`parts` rows, not the data.
    counts = with_pid.groupBy(_PID).agg(F.count(F.lit(1)).alias("__ds_cnt"))
    offsets = counts.select(
        _PID,
        F.coalesce(
            F.sum("__ds_cnt").over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias(_OFF),
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(key_name, (F.col(_OFF) + F.col(_RN)).cast(key_type))
        .drop(_PID, _RN, _OFF)
    )
