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
