"""Z-order (Morton-curve) clustering for multi-column data skipping.

Parquet data skipping works off per-file min/max statistics: a scan
prunes a file when the predicate range misses the file's [min, max].
Sorting the table by column A makes A-predicates prune perfectly — and
destroys pruning on column B, whose values now span the full range in
every file.  Interleaving the bits of both columns' bin numbers (the
Morton/Z curve) gives every file a *small rectangle* of the (A, B) value
space, so point/range predicates on EITHER column prune most files.
This is the layout primitive behind Delta OPTIMIZE ZORDER BY /
Iceberg's sort-order rewrite, expressed on plain parquet.

Implementation is pure column arithmetic (JVM, codegen-friendly):

1. per column, map values to BITS-bit bins — min/max uniform binning,
   computed in one tiny aggregate (for heavily skewed columns swap in
   approx_percentile boundaries; the interleave below is unchanged);
2. interleave bin bits into the z-value with shifts and ORs;
3. repartitionByRange(z) — contiguous z-ranges per output file —
   then sortWithinPartitions(z) so row groups inherit the locality too.

Works for any number of columns; pruning power per column decays as
columns are added (bits per column = BITS/n), which is the documented
z-order trade-off everywhere it exists.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8  # bins per column = 2^BITS


def _bin(col: Column, lo: Column, hi: Column) -> Column:
    """Uniform bin id in [0, 2^BITS): floor((x-lo)/(hi-lo) * (2^BITS-1)).
    Degenerate (constant) columns bin to 0."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo) / span).otherwise(0.0)
    return F.least(
        F.floor(frac * (2**BITS - 1)).cast("long"), F.lit(2**BITS - 1)
    )


def zvalue(*bins: Column) -> Column:
    """Interleave BITS-bit bin ids: bit j of bin i lands at position
    j * n_cols + i."""
    n = len(bins)
    parts = [
        F.shiftleft(
            F.shiftright(b, j).bitwiseAND(F.lit(1)), j * n + i
        )
        for i, b in enumerate(bins)
        for j in range(BITS)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_frame(df: DataFrame, cols: list[str], n_files: int = 8) -> DataFrame:
    """`df` re-clustered along the Z-curve over `cols`, as a DataFrame:
    one pass to collect per-column min/max (a single-row aggregate —
    negligible), one range-shuffle on the z-value, rows sorted by it
    within each of the ``n_files`` output partitions.  At 100 TB the
    range partitioner's sampling is what spreads files evenly along the
    curve; no driver-side data movement anywhere.  This is the
    composable half of :func:`zorder_write` — any writer that records
    per-file stats over a partition-per-file layout (e.g.
    ``TxTable.compact(zorder_by=...)``) inherits multi-column skipping
    locality from it."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    stats = df.agg(*aggs).collect()[0]
    bins = [
        _bin(
            F.col(c),
            F.lit(stats[f"_lo_{c}"]),
            F.lit(stats[f"_hi_{c}"]),
        )
        for c in cols
    ]
    return (
        df.withColumn("_z", zvalue(*bins))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def zorder_write(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Write `df` to parquet z-ordered on `cols` across n_files files."""
    zorder_frame(df, cols, n_files).write.mode("overwrite").parquet(path)
