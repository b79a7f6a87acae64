"""Manifest-log change feed + incremental materialized aggregates
(sources/matview.py).  The t68 gate pins the full lifecycle against a
DuckDB recompute; these pin the algebra the gate composes: the diff's
multiset identity, net-zero rewrites, schema-change refusal, group
birth/death, and no-op refreshes.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.sources import matview as mvx
from ecommerce_data_pipeline_23a91a05i4_spark.sources.txtable import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, g string, x long")


def _multiset(df, cols=("k", "g", "x")):
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def test_changes_satisfy_multiset_identity(spark, tmp_path):
    """snapshot(to) == snapshot(from) ⊎ inserts ∖ deletes — across a
    gap spanning append, delete AND merge in one diff."""
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.init(_df(spark, [(i, "a" if i < 5 else "b", i * 10) for i in range(10)]))
    t.append(_df(spark, [(10, "c", 100)]))
    t.delete(F.col("k") % 3 == 0)
    v4 = t.merge(_df(spark, [(1, "a", 999), (50, "z", 1)]), "k")
    ch = mvx.table_changes(t, v1, v4)
    ins = _multiset(ch.filter(F.col("_change_type") == "insert"))
    rem = _multiset(ch.filter(F.col("_change_type") == "delete"))
    want = _multiset(t.snapshot(v4))
    got = _multiset(t.snapshot(v1)) + ins - rem
    assert got == want


def test_compact_diff_nets_to_zero(spark, tmp_path):
    """A pure compact rewrites every file; the signed aggregate of its
    diff must cancel exactly — and mv_refresh over it must commit
    nothing."""
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.init(_df(spark, [(i, "a", i) for i in range(20)]).repartition(4))
    mv = TxTable(spark, str(tmp_path / "mv"))
    measures = {"sx": "x"}
    mvx.mv_init(mv, t.snapshot(), ["g"], measures)
    v2 = t.compact(1)
    got = mvx.mv_refresh(mv, t, ["g"], measures, v1, v2)
    assert got == mv.latest_version() == 1  # no new MV version


def test_schema_change_is_refused(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.init(_df(spark, [(1, "a", 1)]))
    t.overwrite(spark.createDataFrame([(1.5,)], "y double"))
    with pytest.raises(ValueError, match="different schemas"):
        mvx.table_changes(t, v1)


def test_group_birth_and_death(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.init(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    mv = TxTable(spark, str(tmp_path / "mv"))
    measures = {"sx": "x"}
    mvx.mv_init(mv, t.snapshot(), ["g"], measures)
    # kill group b entirely; create group c
    v2 = t.delete(F.col("g") == "b")
    v3 = t.append(_df(spark, [(3, "c", 30), (4, "c", 40)]))
    mvx.mv_refresh(mv, t, ["g"], measures, v1, v3)
    got = {(r.g, int(r.sx), r.n_rows) for r in mv.snapshot().collect()}
    assert got == {("a", 10, 1), ("c", 70, 2)}  # b's row is GONE


def test_refresh_equals_recompute_exactly(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.init(_df(spark, [(i, str(i % 3), i * 7) for i in range(30)]))
    mv = TxTable(spark, str(tmp_path / "mv"))
    measures = {"sx": "x", "n": "1"}
    mvx.mv_init(mv, t.snapshot(), ["g"], measures)
    v2 = t.delete(F.col("k") % 4 == 0)
    mvx.mv_refresh(mv, t, ["g"], measures, v1, v2)
    v3 = t.merge(_df(spark, [(1, "1", -100), (99, "9", 5)]), "k")
    mvx.mv_refresh(mv, t, ["g"], measures, v2, v3)
    got = sorted(tuple(r) for r in mv.snapshot().collect())
    want = sorted(
        tuple(r)
        for r in mvx.mv_aggregate(t.snapshot(), ["g"], measures).collect()
    )
    assert got == want


def test_null_measure_values_count_as_zero(spark, tmp_path):
    """A CDC batch whose rows carry NULL measure values must not
    poison the stored sums (NULLs aggregate as 0 on BOTH the init and
    the delta path, keeping incremental == recompute exactly)."""
    t = TxTable(spark, str(tmp_path / "t"))
    v1 = t.init(_df(spark, [(1, "a", 10), (2, "b", None)]))
    mv = TxTable(spark, str(tmp_path / "mv"))
    measures = {"sx": "x"}
    mvx.mv_init(mv, t.snapshot(), ["g"], measures)
    v2 = t.append(_df(spark, [(3, "a", None), (4, "c", None)]))
    mvx.mv_refresh(mv, t, ["g"], measures, v1, v2)
    got = sorted(tuple(r) for r in mv.snapshot().collect())
    want = sorted(
        tuple(r)
        for r in mvx.mv_aggregate(t.snapshot(), ["g"], measures).collect()
    )
    assert got == want
    by_g = {r.g: (int(r.sx), r.n_rows) for r in mv.snapshot().collect()}
    assert by_g == {"a": (10, 2), "b": (0, 1), "c": (0, 1)}


def test_null_group_rejected_at_init_and_refresh(spark, tmp_path):
    """ADVICE r6: a NULL GROUP BY value used to initialize fine and
    then brick every refresh at merge time ('NULL in a key column').
    Init and refresh now agree: both reject loudly, pointing at the
    sentinel-encoding fix."""
    bad = _df(spark, [(1, None, 10), (2, "a", 20)])
    mv = TxTable(spark, str(tmp_path / "mv"))
    with pytest.raises(ValueError, match="mv_init: NULL value in a group"):
        mvx.mv_init(mv, bad, ["g"], {"sx": "x"})

    # NULL group arriving only AFTER a clean init → refresh rejects
    # with the same message shape (not merge's generic NULL-key error)
    base = TxTable(spark, str(tmp_path / "base"))
    v1 = base.init(_df(spark, [(1, "a", 10), (2, "b", 20)]))
    mv2 = TxTable(spark, str(tmp_path / "mv2"))
    mvx.mv_init(mv2, base.snapshot(), ["g"], {"sx": "x"})
    v2 = base.append(_df(spark, [(3, None, 30)]))
    with pytest.raises(ValueError, match="mv_refresh: NULL value in a group"):
        mvx.mv_refresh(mv2, base, ["g"], {"sx": "x"}, v1, v2)

    # the documented fix works end-to-end: sentinel-encode the group
    g_expr = "coalesce(g, '<null>')"
    mv3 = TxTable(spark, str(tmp_path / "mv3"))
    sent = base.snapshot().withColumn("g", F.expr(g_expr))
    mvx.mv_init(mv3, sent, ["g"], {"sx": "x"})
    rows = {r.g: r.sx for r in mv3.snapshot().collect()}
    assert rows["<null>"] == 30


def test_global_mv_init_without_group_cols_still_works(spark, tmp_path):
    """A global (no group columns) aggregate has no keys to be NULL —
    the NULL-group rejection must not break it (self-review r7:
    reduce() over an empty iterable raised a bare TypeError)."""
    mv = TxTable(spark, str(tmp_path / "mv"))
    mvx.mv_init(mv, _df(spark, [(1, "a", 10), (2, "b", 20)]), [], {"sx": "x"})
    row = mv.snapshot().collect()[0]
    assert int(row.sx) == 30 and row.n_rows == 2
