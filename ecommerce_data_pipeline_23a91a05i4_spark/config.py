"""Config-file entry point — parity with the reference's config/config.yaml.

The reference drives data scale, retry policy, schedule time and retention
from a YAML file (config/config.yaml:15-23,28-33,43-47); this module maps
the same keys onto the Spark pipeline:

- ``data_generation.customers/products/transactions`` → datagen sizes
- ``data_generation.start_date``                      → run_date
- ``pipeline.max_retries/retry_delay_seconds``        → run_step backoff
- ``scheduler.daily_run_time``                        → run_daily(at=...)
- ``scheduler.retention_days``                        → cleanup_old_files

Sections outside engine scope are accepted and ignored with a note:
``database`` (the engine replaces PostgreSQL; there is no server to
connect to) and ``bi_tool`` (dashboards are out of scope — SURVEY.md §2).

Files may be YAML (if PyYAML is importable) or JSON (always).  JSON is a
subset of YAML, so a JSON file parses under either loader.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

IGNORED_SECTIONS = ("database", "bi_tool")


@dataclass(frozen=True)
class PipelineConfig:
    """Typed view of the reference's config surface (engine scope only)."""

    customers: int = 1000
    products: int = 500
    transactions: int = 10000
    run_date: str | None = None  # data_generation.start_date
    max_retries: int = 3
    retry_delay_seconds: float = 5.0
    atomic_gold: bool = False  # pipeline.atomic_gold — X6 snapshot publish
    daily_run_time: str = "14:45"
    retention_days: int = 7
    ignored_sections: tuple[str, ...] = field(default_factory=tuple)

    def backoff(self) -> list[float]:
        """Retry delays for run_step: exponential from retry_delay_seconds,
        max_retries total attempts (reference retries are fixed-delay,
        pipeline_orchestrator retry loop; exponential is the strictly
        gentler-on-the-cluster choice and collapses to the same attempt
        count)."""
        return [
            self.retry_delay_seconds * (2**i) for i in range(max(0, self.max_retries - 1))
        ]


def _parse(text: str, path: str) -> dict:
    try:
        import yaml  # noqa: PLC0415 — optional dependency, JSON fallback below

        loaded = yaml.safe_load(text)
    except ImportError:
        try:
            loaded = json.loads(text)
        except json.JSONDecodeError as exc:
            # A bare JSONDecodeError on a YAML file never mentions the
            # real problem (PyYAML absent) — say so explicitly.
            raise ValueError(
                f"cannot parse {path}: not valid JSON, and PyYAML is not "
                "installed (install pyyaml if the file is YAML)"
            ) from exc
    if not isinstance(loaded, dict):
        raise ValueError(f"config root must be a mapping: {path}")
    return loaded


def load_config(path: str | Path) -> PipelineConfig:
    raw = _parse(Path(path).read_text(), str(path))
    gen = raw.get("data_generation", {}) or {}
    pipe = raw.get("pipeline", {}) or {}
    sched = raw.get("scheduler", {}) or {}
    ignored = tuple(s for s in IGNORED_SECTIONS if s in raw)
    return PipelineConfig(
        customers=int(gen.get("customers", 1000)),
        products=int(gen.get("products", 500)),
        transactions=int(gen.get("transactions", 10000)),
        run_date=str(gen["start_date"]) if "start_date" in gen else None,
        max_retries=int(pipe.get("max_retries", 3)),
        retry_delay_seconds=float(pipe.get("retry_delay_seconds", 5)),
        atomic_gold=bool(pipe.get("atomic_gold", False)),
        daily_run_time=str(sched.get("daily_run_time", "14:45")),
        retention_days=int(sched.get("retention_days", 7)),
        ignored_sections=ignored,
    )
