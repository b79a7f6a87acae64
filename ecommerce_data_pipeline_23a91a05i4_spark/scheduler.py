"""Daily scheduler with a pidfile lock — the Spark-side realization of the
reference's scheduler surface (X4, `scripts/scheduler.py:53-128`): run the
pipeline once a day at a configured local time, skip if a previous run is
still live, clean the lock on shutdown, and always run retention cleanup
afterwards.

Differences from the reference, by design:

- in-process callable instead of a subprocess per run — one SparkSession
  amortizes JVM startup across days of runs;
- the lock is *stale-aware*: the reference's bare existence check
  (`scheduler.py:53-54`) deadlocks forever after a crash leaves the
  pidfile behind; here a lock whose pid is dead is reclaimed;
- time and sleep are injectable, so the schedule logic is unit-testable
  without wall-clock waits (the reference's loop is untested for the
  same reason it is untestable).

In production the outer loop is usually replaced by cron/Airflow
triggering `python -m ecommerce_data_pipeline_23a91a05i4_spark.pipeline`;
this module exists so the engine is complete without one.
"""

from __future__ import annotations

import logging
import os
import time
from collections.abc import Callable
from pathlib import Path

SECONDS_PER_DAY = 86400


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


class PidfileLock:
    """Single-instance guard: refuses to acquire while another LIVE
    process holds the file; reclaims locks left by dead pids."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def holder(self) -> int | None:
        try:
            pid = int(self.path.read_text().strip())
        except (FileNotFoundError, ValueError):
            return None
        return pid if _pid_alive(pid) else None

    def acquire(self) -> bool:
        if self.holder() is not None:
            return False
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(str(os.getpid()))
        return True

    def release(self) -> None:
        try:
            self.path.unlink()
        except FileNotFoundError:
            pass

    def __enter__(self):
        if not self.acquire():
            raise RuntimeError(f"pipeline already running ({self.path})")
        return self

    def __exit__(self, *exc):
        self.release()
        return False


def seconds_until(at: str, now_epoch: float, utc: bool = True) -> float:
    """Seconds from now_epoch until the next occurrence of HH:MM."""
    hh, mm = (int(x) for x in at.split(":"))
    t = time.gmtime(now_epoch) if utc else time.localtime(now_epoch)
    today_target = (hh * 3600 + mm * 60) - (
        t.tm_hour * 3600 + t.tm_min * 60 + t.tm_sec
    )
    return today_target if today_target > 0 else today_target + SECONDS_PER_DAY


def run_daily(
    run_fn: Callable[[], object],
    at: str = "14:45",
    lock_path: str | Path = "/tmp/ecommerce_pipeline.lock",
    cleanup_fn: Callable[[], object] | None = None,
    max_runs: int | None = None,
    clock: Callable[[], float] = time.time,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Loop: sleep until HH:MM, run under the lock (skip if held), always
    run cleanup_fn, repeat.  A failing run is logged and the loop
    continues (reference behavior: log + keep scheduling,
    `scheduler.py:88-90`).  Returns the number of attempted runs
    (max_runs bounds it; None loops forever, reference behavior
    `scheduler.py:120-128`)."""
    runs = 0
    lock = PidfileLock(lock_path)
    while max_runs is None or runs < max_runs:
        sleep(seconds_until(at, clock()))
        if not lock.acquire():
            continue  # another instance is mid-run: skip this slot
        runs += 1
        try:
            run_fn()
        except Exception:
            logging.exception("scheduled pipeline run failed")
        finally:
            lock.release()
            if cleanup_fn is not None:
                cleanup_fn()
    return runs
