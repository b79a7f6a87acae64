"""Skew-safe join via key salting.

AQE's skew-join handling (on in session.py) splits oversized partitions
at runtime, but only for sort-merge joins it can observe; salting is the
*plan-level* fix you reach for when one side is small enough to
replicate and the hot keys are known or knowable: the big side spreads
each key across SALT buckets, the small side is replicated once per
bucket, and the join key becomes (key, salt) — no single reducer ever
owns a whole hot key.

Trade-off made explicit: the small side is materialized SALT× (fine for
dimension-sized tables, wrong for fact-fact joins — use bucketing /
AQE there, sources/registry.write_bucketed).  Salting an aggregation
instead of a join is the two-stage pattern in plans/extras.q18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
    salt_source: str | None = None,
) -> DataFrame:
    """Join `large` ⋈ `small` on `on` with the large side salted across
    `salt` buckets and the small side exploded once per bucket.

    The salt must be DETERMINISTIC per row (retries/speculative tasks
    re-derive it), so it is hashed from row content: `salt_source` names
    a high-cardinality column to hash (e.g. an event id); the default
    hashes all columns.  rand()-based salting breaks exactly-once
    semantics under task retry.

    Supports inner and left joins (the small side is on the right)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    src = (
        F.xxhash64(F.col(salt_source))
        if salt_source
        else F.xxhash64(*[F.col(c) for c in large.columns])
    )
    salted_large = large.withColumn("_salt", F.pmod(src, F.lit(salt)))
    replicated_small = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>")),
    )
    return salted_large.join(
        replicated_small, [on, "_salt"], how
    ).drop("_salt")
