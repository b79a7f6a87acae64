"""Scheduler (X4): schedule math, pidfile locking incl. stale-lock
reclaim, and the daily loop under an injected clock — no wall-clock
sleeps anywhere."""

from __future__ import annotations

import os

from ecommerce_data_pipeline_23a91a05i4_spark.scheduler import (
    SECONDS_PER_DAY,
    PidfileLock,
    run_daily,
    seconds_until,
)

# 2024-06-01 00:00:00 UTC — a known midnight to anchor schedule math
MIDNIGHT = 1717200000.0


def test_seconds_until_before_and_after_target():
    assert seconds_until("14:45", MIDNIGHT) == 14 * 3600 + 45 * 60
    after = MIDNIGHT + 15 * 3600  # 15:00, past today's 14:45
    assert seconds_until("14:45", after) == SECONDS_PER_DAY - 15 * 60
    # exactly at the target -> schedules tomorrow, never a zero sleep
    at = MIDNIGHT + 14 * 3600 + 45 * 60
    assert seconds_until("14:45", at) == SECONDS_PER_DAY


def test_pidfile_lock_blocks_live_and_reclaims_dead(tmp_path):
    path = tmp_path / "pipeline.lock"
    lock = PidfileLock(path)
    assert lock.acquire()
    assert path.read_text() == str(os.getpid())
    # a second instance must refuse while this (live) pid holds it
    assert not PidfileLock(path).acquire()
    lock.release()
    assert not path.exists()

    # stale lock: a pid that cannot exist -> reclaimed
    path.write_text("999999999")
    assert PidfileLock(path).acquire()
    PidfileLock(path).release()

    # garbage content -> treated as stale
    path.write_text("not-a-pid")
    assert PidfileLock(path).acquire()


def test_pidfile_lock_context_manager(tmp_path):
    path = tmp_path / "l.lock"
    with PidfileLock(path):
        assert path.exists()
        try:
            with PidfileLock(path):
                raise AssertionError("double acquire must fail")
        except RuntimeError:
            pass
    assert not path.exists()


def test_run_daily_fires_at_schedule_and_always_cleans_up(tmp_path):
    now = {"t": MIDNIGHT}
    sleeps: list[float] = []
    events: list[str] = []

    def clock() -> float:
        return now["t"]

    def sleep(s: float) -> None:
        sleeps.append(s)
        now["t"] += s

    def run() -> None:
        events.append("run")
        if len([e for e in events if e == "run"]) == 2:
            raise RuntimeError("transient failure on run 2")

    runs = run_daily(
        run,
        at="14:45",
        lock_path=tmp_path / "d.lock",
        cleanup_fn=lambda: events.append("cleanup"),
        max_runs=3,
        clock=clock,
        sleep=sleep,
    )
    assert runs == 3
    # failure on run 2 neither stops the loop nor skips cleanup
    assert events == ["run", "cleanup"] * 3
    assert sleeps[0] == 14 * 3600 + 45 * 60
    assert sleeps[1] == SECONDS_PER_DAY
    assert sleeps[2] == SECONDS_PER_DAY
    assert not (tmp_path / "d.lock").exists()


def test_run_daily_skips_slot_when_lock_held(tmp_path):
    lock_path = tmp_path / "held.lock"
    lock_path.write_text(str(os.getpid()))  # a live holder

    now = {"t": MIDNIGHT}
    fired: list[float] = []
    state = {"slots": 0}

    def clock() -> float:
        return now["t"]

    def sleep(s: float) -> None:
        now["t"] += s
        state["slots"] += 1
        if state["slots"] == 2:
            lock_path.unlink()  # holder finishes after the first slot

    runs = run_daily(
        lambda: fired.append(now["t"]),
        at="02:00",
        lock_path=lock_path,
        max_runs=1,
        clock=clock,
        sleep=sleep,
    )
    assert runs == 1
    assert state["slots"] == 2  # first slot skipped, second fired
