"""Op-aware commit conflict resolution (VERDICT r10 next #1).

TxTable._commit_or_rebase classifies the commits that interleaved with
a lost commit race instead of blanket re-stage-and-retry: disjoint data
commits REBASE (the transaction's delta replays onto the new head
without re-running its plan), while interleaves that rewrote the
transaction's input files or changed table metadata surface as a
specific CommitConflict and the verb re-derives (or the caller does).
Isolation for the rebasing DML verbs is WriteSerializable — Delta's
default — with ``isolation="serializable"`` forcing re-derivation.

Races are injected deterministically: a second handle's _stage /
_stage_dv is wrapped to land a concurrent commit between the victim's
plan execution and its commit attempt — the same harness the layout-
change race test in test_txtable.py uses.
"""

from __future__ import annotations

import json
import os

import pytest

from ecommerce_data_pipeline_23a91a05i4_spark.sources.txtable import (
    CommitConflict,
    TxTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _inject_after_stage(victim: TxTable, action, method: str = "_stage"):
    """Wrap ``victim.<method>`` so that ``action()`` runs ONCE right
    after the first staging completes — i.e. after the victim computed
    and wrote its plan's output, before its commit attempt.  Returns a
    dict with the observed stage-call count."""
    orig = getattr(victim, method)
    state = {"stages": 0, "fired": False}

    def wrapper(*args, **kw):
        out = orig(*args, **kw)
        state["stages"] += 1
        if not state["fired"]:
            state["fired"] = True
            action()
        return out

    setattr(victim, method, wrapper)
    return state


# --------------------------------------------------------------- rebase


def test_concurrent_appends_both_land_without_restage(spark, tmp_path):
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    a.init(_df(spark, [(1, "a")]))
    state = _inject_after_stage(
        b, lambda: a.append(_df(spark, [(2, "b")]))
    )
    b.append(_df(spark, [(3, "c")]))
    assert state["stages"] == 1  # rebase, not restage
    assert {r.k for r in a.snapshot().collect()} == {1, 2, 3}
    assert [h["op"] for h in a.history()] == ["init", "append", "append"]


def test_compact_racing_append_rebases_without_restage(spark, tmp_path):
    """The VERDICT r10 starvation case: a compact racing a steady
    append stream must land WITHOUT re-reading or re-staging — the
    appended files are disjoint from the compact's inputs."""
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    a.init(_df(spark, [(1, "a")]).coalesce(1))
    a.append(_df(spark, [(2, "b")]).coalesce(1))
    state = _inject_after_stage(
        b, lambda: a.append(_df(spark, [(9, "z")]).coalesce(1))
    )
    v = b.compact(1)
    assert state["stages"] == 1  # plan ran once; conflict was rebased
    assert v == a.latest_version()
    assert {r.k for r in a.snapshot().collect()} == {1, 2, 9}
    # head state = the interleaved append's file + the one compacted file
    assert len(a.manifest()["files"]) == 2
    assert [h["op"] for h in a.history()] == [
        "init", "append", "append", "compact",
    ]


def test_scoped_compacts_of_disjoint_partitions_both_land(spark, tmp_path):
    """Two scoped OPTIMIZE jobs over DIFFERENT partitions commute: the
    loser rebases because the winner's removed files are outside its
    scope."""
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    df = spark.createDataFrame(
        [(i, "p%d" % (i % 2)) for i in range(12)], "k long, p string"
    )
    a.init(df.repartition(6), partition_by="p")
    n0 = len(a.manifest()["files"])
    assert n0 > 2
    state = _inject_after_stage(b, lambda: a.compact(1, where="p0"))
    b.compact(1, where="p1")
    assert state["stages"] == 1
    assert {r.k for r in a.snapshot().collect()} == set(range(12))
    by_part = {}
    for e in a.manifest()["files"]:
        by_part.setdefault(e["part"], []).append(e)
    assert {k: len(v) for k, v in by_part.items()} == {"p0": 1, "p1": 1}


def test_delete_dv_rebases_over_blind_append(spark, tmp_path):
    """delete_dv vs blind append under WriteSerializable (the default):
    the delete's vector rebases onto the head and the delete serializes
    logically BEFORE the append — concurrently-appended rows matching
    the predicate SURVIVE (Delta's documented WriteSerializable
    semantics for blind appends)."""
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    a.init(_df(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")]).coalesce(2))
    state = _inject_after_stage(
        b,
        lambda: a.append(_df(spark, [(5, "e"), (6, "f")]).coalesce(1)),
        method="_stage_dv",
    )
    b.delete_dv("k >= 3")
    assert state["stages"] == 1  # vector staged once; rebased
    # 3,4 deleted; appended 5,6 survive despite matching the predicate
    assert {r.k for r in a.snapshot().collect()} == {1, 2, 5, 6}


def test_delete_dv_serializable_re_derives_over_append(spark, tmp_path):
    """isolation='serializable' skips the rebase: the retry re-derives
    against the post-append snapshot, so appended rows matching the
    predicate are deleted too (full serializability)."""
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    a.init(_df(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")]).coalesce(2))
    _inject_after_stage(
        b,
        lambda: a.append(_df(spark, [(5, "e"), (6, "f")]).coalesce(1)),
        method="_stage_dv",
    )
    b.delete_dv("k >= 3", isolation="serializable")
    assert {r.k for r in a.snapshot().collect()} == {1, 2}


def test_delete_rebases_over_blind_append(spark, tmp_path):
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    a.init(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1))
    state = _inject_after_stage(
        b, lambda: a.append(_df(spark, [(30, "z")]).coalesce(1))
    )
    b.delete("k >= 3")
    assert state["stages"] == 1
    # WriteSerializable: the appended k=30 survives
    assert {r.k for r in a.snapshot().collect()} == {1, 2, 30}


def test_delete_racing_rewrite_of_hit_file_re_derives(spark, tmp_path):
    """A compact that rewrote the delete's hit files is a LOGICAL
    conflict — the rebase refuses (the vector/rewrite was computed
    from stale bytes) and the verb re-derives against the new
    snapshot, still landing the correct final state."""
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    a.init(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1))
    state = _inject_after_stage(b, lambda: a.compact(1))
    b.delete("k = 2")
    assert state["stages"] == 2  # re-derived: plan ran twice
    assert {r.k for r in a.snapshot().collect()} == {1, 3}


def test_append_conflicts_with_concurrent_constraint_add(spark, tmp_path):
    """Metadata conflict class: files staged before a concurrent
    add_check_constraint were never validated against it, so the
    append must fail loudly (Delta's MetadataChangedException) instead
    of committing rows that dodge the new invariant."""
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    a.init(_df(spark, [(1, "a")]))
    _inject_after_stage(
        b, lambda: a.add_check_constraint("k_small", "k < 100")
    )
    with pytest.raises(CommitConflict, match="constraints"):
        b.append(_df(spark, [(500, "big")]))
    assert {r.k for r in a.snapshot().collect()} == {1}


def test_optimize_small_rebases_over_append(spark, tmp_path):
    path = str(tmp_path / "t")
    a, b = TxTable(spark, path), TxTable(spark, path)
    a.init(_df(spark, [(1, "a")]).coalesce(1))
    a.append(_df(spark, [(2, "b")]).coalesce(1))
    state = _inject_after_stage(
        b, lambda: a.append(_df(spark, [(3, "c")]).coalesce(1))
    )
    b.optimize_small(target_bytes=1 << 30)
    assert state["stages"] == 1  # debt was not re-derived
    assert {r.k for r in a.snapshot().collect()} == {1, 2, 3}


# ------------------------------------------------- protocol feature gate


def _latest_manifest_path(t: TxTable) -> str:
    v = t.latest_version()
    return os.path.join(t.path, "_txlog", f"{v:020d}.json")


def _add_features(t: TxTable, reader=None, writer=None):
    p = _latest_manifest_path(t)
    with open(p) as f:
        m = json.load(f)
    feats = m.get("features") or {}
    if reader:
        feats["reader"] = sorted(set(feats.get("reader") or []) | set(reader))
    if writer:
        feats["writer"] = sorted(set(feats.get("writer") or []) | set(writer))
    m["features"] = feats
    with open(p, "w") as f:
        json.dump(m, f)


def test_unknown_reader_feature_fails_loudly(spark, tmp_path):
    """An era-3 log must make an old reader fail SPECIFICALLY, naming
    the missing feature — never misread by accident (VERDICT r10 next
    #8)."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    _add_features(t, reader=["era3-frobnication"])
    fresh = TxTable(spark, str(tmp_path / "t"))
    with pytest.raises(RuntimeError, match="era3-frobnication"):
        fresh.snapshot()
    with pytest.raises(RuntimeError, match="reader feature"):
        fresh.manifest()


def test_unknown_writer_feature_blocks_writes_not_reads(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    _add_features(t, writer=["era3-commit-proto"])
    fresh = TxTable(spark, str(tmp_path / "t"))
    # reads stay fine: the gate is writer-side only
    assert {r.k for r in fresh.snapshot().collect()} == {1}
    with pytest.raises(RuntimeError, match="era3-commit-proto"):
        fresh.append(_df(spark, [(2, "b")]))
    # nothing landed
    assert fresh.latest_version() == 1


def test_known_features_carry_forward_and_allow_commits(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    _add_features(t, reader=["v2-log"], writer=["v2-log"])
    fresh = TxTable(spark, str(tmp_path / "t"))
    fresh.append(_df(spark, [(2, "b")]))
    # the feature lists ride the new commit forward
    assert fresh.manifest()["features"] == {
        "reader": ["v2-log"], "writer": ["v2-log"],
    }


# ------------------------------------------- timestamp monotonic clamp


def test_version_at_timestamp_clamps_clock_skew(spark, tmp_path):
    """ADVICE r10: a later version stamped with an EARLIER wall time
    (multi-writer clock skew) must not win 'latest version at ts' over
    a version the reader at ts actually saw."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.append(_df(spark, [(3, "c")]))
    log = os.path.join(t.path, "_txlog")
    stamps = {1: 100.0, 2: 200.0, 3: 150.0}  # v3 skewed before v2
    for v, at in stamps.items():
        p = os.path.join(log, f"{v:020d}.json")
        with open(p) as f:
            m = json.load(f)
        m["committed_at"] = at
        with open(p, "w") as f:
            json.dump(m, f)
    # at ts=170 a reader saw v1 only (v2 landed at 200; v3 AFTER v2 by
    # version order, its 150 stamp is skew) — clamped scan returns 1
    assert t.version_at_timestamp(170.0) == 1
    assert t.version_at_timestamp(200.0) == 3  # clamp: v3 at max(150,200)
    with pytest.raises(ValueError, match="before the first"):
        t.version_at_timestamp(99.0)


# ------------------------------------------------ copy_into registry


def _write_src(spark, d: str, name: str, rows):
    _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "_tmp")
    )
    import glob as _glob
    import shutil

    os.makedirs(d, exist_ok=True)
    src = _glob.glob(os.path.join(d, "_tmp", "*.parquet"))[0]
    shutil.move(src, os.path.join(d, name))
    shutil.rmtree(os.path.join(d, "_tmp"))


def test_copy_into_memory_survives_vacuum(spark, tmp_path):
    """ADVICE r10: the cumulative copy_registry rides EVERY commit
    forward (the stream_floors discipline), so vacuuming past the
    copy_into commits cannot re-ingest their source files — the old
    per-manifest union forgot them with the pruned manifests."""
    land = str(tmp_path / "landing")
    _write_src(spark, land, "a.parquet", [(1, "a")])
    _write_src(spark, land, "b.parquet", [(2, "b")])
    t = TxTable(spark, str(tmp_path / "t"))
    t.init(_df(spark, []))
    v, loaded = t.copy_into(land)
    assert len(loaded) == 2
    # bury the copy_into commit under appends, then vacuum it away
    for i in range(3):
        t.append(_df(spark, [(100 + i, "x")]))
    t.vacuum(keep_versions=1, min_age_seconds=0)
    assert t.versions() == [t.latest_version()]  # copy_into manifest gone
    # idempotence memory survives: nothing re-ingests
    assert t.copy_into(land) == (None, [])
    # a genuinely new landing file still loads — and only it
    _write_src(spark, land, "c.parquet", [(3, "c")])
    v2, loaded2 = t.copy_into(land)
    assert [os.path.basename(p) for p in loaded2] == ["c.parquet"]
    assert {r.k for r in t.snapshot().collect()} == {1, 2, 3, 100, 101, 102}


def test_copy_into_registry_is_o1_not_a_log_walk(spark, tmp_path):
    """ADVICE r10: _ingested_files with a registry reads ONE sidecar —
    never O(versions) manifest parses per call."""
    land = str(tmp_path / "landing")
    _write_src(spark, land, "a.parquet", [(1, "a")])
    t = TxTable(spark, str(tmp_path / "t"))
    t.init(_df(spark, []))
    t.copy_into(land)
    for i in range(10):
        t.append(_df(spark, [(10 + i, "x")]))
    calls = {"n": 0}
    orig = t._manifest_raw

    def counting(v):
        calls["n"] += 1
        return orig(v)

    t._manifest_raw = counting
    got = t._ingested_files()
    assert len(got) == 1
    # one read for the latest manifest (entry resolution is cached);
    # the registry sidecar replaces the whole-log walk
    assert calls["n"] <= 2


def test_copy_into_flips_writer_feature(spark, tmp_path):
    """The first registry write flips the copy-registry WRITER feature
    so a pre-registry engine (whose commits would drop the carried
    reference) fails loudly instead of silently erasing the memory."""
    land = str(tmp_path / "landing")
    _write_src(spark, land, "a.parquet", [(1, "a")])
    t = TxTable(spark, str(tmp_path / "t"))
    t.init(_df(spark, []))
    t.copy_into(land)
    assert "copy-registry" in t.manifest()["features"]["writer"]
    # this engine supports it: later appends carry it and still land
    t.append(_df(spark, [(2, "b")]))
    assert "copy-registry" in t.manifest()["features"]["writer"]


def test_legacy_copy_into_keys_upgrade_to_registry(spark, tmp_path):
    """A table whose older manifests carry only the per-commit
    copy_into keys (the pre-registry era) is read by the legacy union
    once; its next copy_into writes the registry."""
    land = str(tmp_path / "landing")
    _write_src(spark, land, "a.parquet", [(1, "a")])
    t = TxTable(spark, str(tmp_path / "t"))
    t.init(_df(spark, []))
    # simulate a pre-registry copy_into commit: extra key, no registry
    m = t.manifest()
    from pyspark.sql.types import StructType as _ST

    t._commit(
        m["files"],
        "copy_into",
        m["version"],
        _ST.fromJson(json.loads(m["schema"])),
        None,
        extra={"copy_into": [os.path.join(land, "a.parquet")]},
    )
    assert t.manifest().get("copy_registry") is None
    assert t.copy_into(land) == (None, [])  # legacy union still honored
    _write_src(spark, land, "b.parquet", [(2, "b")])
    v, loaded = t.copy_into(land)
    assert [os.path.basename(p) for p in loaded] == ["b.parquet"]
    reg = t.manifest()["copy_registry"]
    assert reg["n"] == 2  # the registry absorbed the legacy keys


def test_threaded_concurrent_appends_all_land(spark, tmp_path):
    """TRUE concurrency (not injection): four driver threads race
    three appends each against one table path.  Rebase means nobody
    restages and nobody starves — all 12 rows land, one commit per
    append."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "t")
    TxTable(spark, path).init(_df(spark, []))

    def worker(i: int) -> None:
        t = TxTable(spark, path)
        for j in range(3):
            t.append(_df(spark, [(i * 10 + j, f"w{i}")]), max_retries=25)

    with ThreadPoolExecutor(4) as ex:
        list(ex.map(worker, range(4)))
    t = TxTable(spark, path)
    got = {r.k for r in t.snapshot().collect()}
    assert got == {i * 10 + j for i in range(4) for j in range(3)}
    assert t.latest_version() == 13  # init + 12 appends, no lost commits


def test_stream_sink_rebases_over_disjoint_commit(spark, tmp_path):
    """A micro-batch racing a DISJOINT concurrent commit (a batch
    append from another writer) must land, not fail the stream: the
    staged batch re-proposes onto the new head with floors max-merged
    from it."""
    from ecommerce_data_pipeline_23a91a05i4_spark.sources.txtable import (
        TxTableStreamSink,
    )

    path = str(tmp_path / "t")
    a = TxTable(spark, path)
    a.init(_df(spark, []))
    sink = TxTableStreamSink(a, app_id="s")
    state = _inject_after_stage(
        a, lambda: TxTable(spark, path).append(_df(spark, [(99, "z")]))
    )
    sink(_df(spark, [(1, "a")]), 0)
    # one staging on this handle (the injected append staged via its
    # own fresh handle): the batch landed by REBASE, not a restage
    assert state["stages"] == 1
    assert {r.k for r in a.snapshot().collect()} == {1, 99}
    # the interleaved append carried no floor regression: batch 0 is
    # recorded, a replay no-ops
    sink(_df(spark, [(1, "a")]), 0)
    assert {r.k for r in a.snapshot().collect()} == {1, 99}


def test_stream_sink_duplicate_batch_race_stays_exactly_once(
    spark, tmp_path
):
    """Two sink instances of the SAME app racing the SAME batch id:
    the loser must detect the winner's commit on retry and drop out —
    rebase must never double-append a batch."""
    from ecommerce_data_pipeline_23a91a05i4_spark.sources.txtable import (
        TxTableStreamSink,
    )

    path = str(tmp_path / "t")
    a = TxTable(spark, path)
    a.init(_df(spark, []))
    loser = TxTableStreamSink(a, app_id="s")
    winner = TxTableStreamSink(TxTable(spark, path), app_id="s")
    state = _inject_after_stage(
        a, lambda: winner(_df(spark, [(1, "a")]), 0)
    )
    loser(_df(spark, [(1, "a")]), 0)  # stages, loses the race, drops out
    assert state["stages"] == 1  # the winner staged on its own handle
    rows = [r.k for r in a.snapshot().collect()]
    assert rows == [1]  # exactly once
    assert a.latest_version() == 2  # init + ONE stream commit


def test_stream_sink_refuses_concurrent_layout_change(spark, tmp_path):
    from ecommerce_data_pipeline_23a91a05i4_spark.sources.txtable import (
        TxTableStreamSink,
    )

    path = str(tmp_path / "t")
    a = TxTable(spark, path)
    a.init(_df(spark, [(1, "a")]))
    sink = TxTableStreamSink(a, app_id="s")
    _inject_after_stage(
        a,
        lambda: TxTable(spark, path).add_check_constraint(
            "k_pos", "k >= 0"
        ),
    )
    with pytest.raises(CommitConflict, match="metadata/layout"):
        sink(_df(spark, [(2, "b")]), 0)
