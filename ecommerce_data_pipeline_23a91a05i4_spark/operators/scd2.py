"""True SCD Type-2 merge — the extension the reference declares but never
implements (its loader truncate-reloads with degenerate SCD2 columns,
load_warehouse.py:72-76; SURVEY.md §1.1).

Semantics: given the current dimension state and a batch of updates keyed
by the business key,

- changed rows: the current version is closed out (end_date = run_date,
  is_current = false) and a new current version is appended
- new keys: inserted as current
- unchanged rows (same tracked-attribute values): left untouched

Pure DataFrame implementation over plain parquet (no Delta/Iceberg MERGE
needed): one join on the business key + a union — shuffles once on the
key.  Change detection compares a stable hash of the tracked columns, so
adding tracked attributes never rewrites history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attr_hash(df: DataFrame, tracked: list[str]) -> F.Column:
    return F.sha2(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in tracked]), 256)


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    business_key: str,
    tracked: list[str],
    run_date: str,
) -> DataFrame:
    """Returns the new full dimension state.

    ``current`` must carry effective_date/end_date/is_current;
    ``updates`` carries the business key + attribute columns only.
    """
    from pyspark.sql import Window

    attr_cols = [c for c in updates.columns if c != business_key]
    upd = updates.select(
        F.col(business_key), *[F.col(c) for c in attr_cols]
    ).withColumn("_new_hash", _attr_hash(updates, tracked))
    # a CDC batch may carry several rows per key; keep exactly one,
    # deterministically (lowest attribute hash) — otherwise two
    # is_current=true versions would break the one-current-row invariant
    # the fact build's is_current join guard relies on
    w = Window.partitionBy(business_key).orderBy("_new_hash")
    upd = (
        upd.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    cur_live = current.filter(F.col("is_current"))
    cur_hist = current.filter(~F.col("is_current"))
    cur_hashed = cur_live.withColumn("_cur_hash", _attr_hash(cur_live, tracked))

    joined = cur_hashed.alias("c").join(
        upd.alias("u"), business_key, "full_outer"
    )

    changed_keys = joined.filter(
        F.col("u._new_hash").isNotNull()
        & F.col("c._cur_hash").isNotNull()
        & (F.col("u._new_hash") != F.col("c._cur_hash"))
    ).select(business_key)

    # 1. close out changed current rows
    closed = (
        cur_live.join(changed_keys, business_key, "left_semi")
        .withColumn("end_date", F.lit(run_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    # 2. untouched current rows (unchanged or absent from the update batch)
    untouched = cur_live.join(changed_keys, business_key, "left_anti")

    # 3. fresh versions: changed keys + brand-new keys
    new_keys = joined.filter(
        F.col("u._new_hash").isNotNull() & F.col("c._cur_hash").isNull()
    ).select(business_key)
    fresh_src = upd.join(
        changed_keys.unionAll(new_keys), business_key, "left_semi"
    ).drop("_new_hash")
    fresh = (
        fresh_src.withColumn("effective_date", F.lit(run_date).cast("date"))
        .withColumn("end_date", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
    )

    cols = [c for c in current.columns]
    # align fresh to the dimension schema: any non-update columns (e.g.
    # surrogate keys) must be re-derived by the caller; here they are
    # nulled so the output schema stays stable
    for c in cols:
        if c not in fresh.columns:
            fresh = fresh.withColumn(c, F.lit(None).cast(current.schema[c].dataType))
    return (
        cur_hist.select(cols)
        .unionAll(closed.select(cols))
        .unionAll(untouched.select(cols))
        .unionAll(fresh.select(cols))
    )


# ---------------------------------------------- partition-pruned SCD2 merge

SCD2_BUCKET_COL = "scd_bucket"


def scd2_bucket(business_key_col: F.Column, n_buckets: int) -> F.Column:
    """Dimension partition key: a stable hash-bucket of the business key.

    Because the bucket is a pure function of the key, the set of
    partitions an update batch touches is computable from the BATCH ALONE
    — no scan of the dimension — which is what makes the merge below
    partition-pruned: at 100 TB a small CDC batch touches a handful of
    buckets and the other ~all of the table is neither read nor
    rewritten.  (A date-partitioned dimension can't promise that: a key's
    current row may live in any date partition.)"""
    return F.pmod(F.xxhash64(business_key_col.cast("string")), F.lit(n_buckets))


def write_dim_partitioned(
    df: DataFrame, path: str, business_key: str, n_buckets: int
) -> None:
    """Initial load of a dimension in the bucket-partitioned layout the
    pruned merge requires (one directory per scd_bucket)."""
    df.withColumn(
        SCD2_BUCKET_COL, scd2_bucket(F.col(business_key), n_buckets)
    ).write.mode("overwrite").partitionBy(SCD2_BUCKET_COL).parquet(path)


def scd2_merge_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    business_key: str,
    tracked: list[str],
    run_date: str,
    n_buckets: int,
    fs=None,
) -> list[int]:
    """MERGE-shaped SCD2 over plain parquet: rewrite ONLY the partitions
    whose bucket contains a key from the update batch; every other
    partition's files are never read, never rewritten, byte-untouched
    (asserted by tests/test_monitor_scd2.py on file stats).

    1. affected buckets <- distinct scd2_bucket(update keys) — collect is
       bounded by n_buckets, a config constant, never data volume;
    2. read the dimension WITH a bucket-IN filter (partition pruning at
       the scan: only affected directories are listed/read);
    3. run the ordinary scd2_merge on that slice;
    4. publish per-partition via stage-then-swap: write the merged slice
       to a staging dir, then atomically replace just the affected
       bucket directories (same crash discipline as
       sources/maintenance.py's pointer swap — a crash mid-swap leaves
       whole partitions either old or new, never mixed files).

    This is the plain-parquet answer to Delta/Iceberg MERGE; swapping the
    writer for a transactional format changes step 4 only — and that
    format exists in-repo: sources/txtable.scd2_merge_tx runs the same
    pruned merge as a single manifest commit (snapshot isolation, no
    renames, object-store-safe), the preferred path for new tables.
    Returns the affected bucket ids (observability + test hook).

    Filesystem: step 4 runs through the ``fs`` verbs (sources/fs.py) —
    POSIX for bare local paths, the JVM Hadoop ``FileSystem`` for any
    scheme'd URI (hdfs://, s3a://, …), auto-picked from the path when
    ``fs`` is None.  HDFS renames are atomic like POSIX; object-store
    renames are copy+delete, where the protocol degrades from crash-ATOMIC
    to crash-CONVERGENT (see below) — a transactional table format is the
    upgrade path if that window matters.

    Crash recovery: the swap renames the old partition to a dot-prefixed
    `.bucket.old` dir (invisible to Spark) before moving the new one in,
    so a crash inside that window leaves the partition hidden, not
    mixed.  Every call first rolls back any leftover `.old` dirs whose
    partition is missing (crash before move-in) and clears those whose
    swap completed — so a retry of a crashed merge always starts from a
    consistent wholly-old/wholly-new state and converges
    (tests/test_monitor_scd2.py crash test, run under both filesystems).
    """
    import posixpath

    from ..sources.fs import filesystem_for

    if fs is None:
        fs = filesystem_for(spark, path)

    for tmp_old in fs.glob(path, f".{SCD2_BUCKET_COL}=*.old"):
        name = posixpath.basename(tmp_old)
        dst = posixpath.join(path, name[1:-len(".old")])
        if fs.exists(dst):
            fs.delete(tmp_old)  # swap completed; old copy is garbage
        else:
            fs.rename(tmp_old, dst)  # crashed mid-swap; roll back to old

    upd_buckets = updates.select(
        scd2_bucket(F.col(business_key), n_buckets).alias("b")
    ).distinct()
    affected = sorted(r.b for r in upd_buckets.collect())
    if not affected:
        return []

    current = spark.read.parquet(path).filter(
        F.col(SCD2_BUCKET_COL).isin(affected)
    )
    merged = scd2_merge(
        current.drop(SCD2_BUCKET_COL), updates, business_key, tracked, run_date
    ).withColumn(SCD2_BUCKET_COL, scd2_bucket(F.col(business_key), n_buckets))

    staging = f"{path}__scd2_stage"
    merged.write.mode("overwrite").partitionBy(SCD2_BUCKET_COL).parquet(staging)
    try:
        for b in affected:
            src = posixpath.join(staging, f"{SCD2_BUCKET_COL}={b}")
            dst = posixpath.join(path, f"{SCD2_BUCKET_COL}={b}")
            tmp_old = posixpath.join(path, f".{SCD2_BUCKET_COL}={b}.old")
            # an affected bucket holds >=1 update key, and scd2_merge
            # never drops rows, so its staged output MUST exist — verify
            # BEFORE setting the live partition aside (a missing stage
            # dir here would otherwise silently delete the partition)
            if not fs.exists(src):
                raise RuntimeError(
                    f"scd2 swap: staged output missing for bucket {b} "
                    f"({src}); live partition left untouched"
                )
            if fs.exists(dst):
                fs.rename(dst, tmp_old)
            fs.rename(src, dst)
            if fs.exists(tmp_old):
                fs.delete(tmp_old)
    finally:
        fs.delete(staging)
    return affected
