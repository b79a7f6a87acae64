"""End-to-end pipeline orchestration (reference:
scripts/pipeline_orchestrator.py, scripts/ingestion/ingest_to_staging.py,
scripts/cleanup_old_data.py).

The reference runs 6 subprocesses passing state through PostgreSQL; here
the steps are in-process functions on one SparkSession passing state
through a parquet lakehouse:

    bronze  (= staging)    raw CSV ingest with explicit schemas + loaded_at
    silver  (= production) cleansed, validated, derived columns
    gold    (= warehouse)  star schema + aggregate tables
    analytics              the 10-query suite → CSV + summary JSON

Kept operator-for-operator: fail-fast linear DAG (X1), retry w/ backoff
[1,2,4]s ×3 (X2, pipeline_orchestrator.py:55-56), execution report (X3),
truncate-and-reload vs anti-join incremental modes (S5/J4), row-count
reconciliation (S10/Q11), retention cleanup (X5).  The daily scheduler
with pidfile lock (X4, scheduler.py:53-128) lives in scheduler.py —
stale-aware, clock-injectable; cron/Airflow can equally drive
run_pipeline directly.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datagen, schemas, warehouse
from .operators import cleanse, quality
from .plans.ecommerce_analytics import run_analytics

RETRY_BACKOFF_S = [1, 2, 4]  # pipeline_orchestrator.py:55-56
RETENTION_PRESERVE = ("summary", "report", "metadata")  # cleanup_old_data.py:39-40


@dataclass
class StepResult:
    name: str
    status: str
    duration_s: float
    retries: int = 0
    error: str | None = None


@dataclass
class PipelineReport:
    steps: list[StepResult] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "overall_status": "success"
            if all(s.status == "success" for s in self.steps)
            else "failed",
            "steps_executed": {
                s.name: {
                    "status": s.status,
                    "duration_seconds": round(s.duration_s, 2),
                    "retries": s.retries,
                    **({"error": s.error} if s.error else {}),
                }
                for s in self.steps
            },
        }


def run_step(name: str, fn, report: PipelineReport, backoff=RETRY_BACKOFF_S) -> bool:
    """X2: retry with backoff, fail-fast signalling (X1)."""
    t0 = time.perf_counter()
    last_err: str | None = None
    for attempt, wait in enumerate([0, *backoff]):
        if wait:
            time.sleep(wait)
        try:
            fn()
            report.steps.append(
                StepResult(name, "success", time.perf_counter() - t0, attempt)
            )
            return True
        except Exception as e:  # noqa: BLE001 — orchestrator catches all (X2)
            last_err = f"{type(e).__name__}: {e}"
    report.steps.append(
        StepResult(name, "failed", time.perf_counter() - t0, len(backoff), last_err)
    )
    return False


def _bronze_path(base: Path, table: str) -> str:
    return str(base / "bronze" / table)


def _silver_path(base: Path, table: str) -> str:
    return str(base / "silver" / table)


def _gold_path(base: Path, table: str) -> str:
    """Reader path for a gold table — snapshot-pointer-aware: after an
    atomic publish (silver_to_gold(atomic=True)) this resolves through
    gold/_CURRENT; with the flat legacy layout it is gold/<table>."""
    from .sources.maintenance import resolve_table_path

    return resolve_table_path(base / "gold", table)


def ingest_to_bronze(
    spark: SparkSession, raw_dir: Path, base: Path, run_ts: str | None = None
) -> dict:
    """S1+S10: CSV → parquet with explicit DDL schemas and a loaded_at
    audit column; per-table row-count reconciliation; truncate-and-reload
    (overwrite — S5)."""
    from pyspark.sql import Observation

    expected, actual = {}, {}
    ts = F.lit(run_ts).cast("timestamp") if run_ts else F.current_timestamp()
    for name, schema in schemas.STAGING.items():
        csv_path = str(raw_dir / f"{name}.csv")
        # observe() counts rows in the SAME pass as the write — the
        # reconciliation's "expected" side without a second CSV scan
        # (the reference re-reads the CSV, ingest_to_staging.py:105)
        obs = Observation(f"ingest_{name}")
        df = (
            spark.read.schema(schema)
            .option("header", True)
            .csv(csv_path)
            .observe(obs, F.count(F.lit(1)).alias("rows"))
            .withColumn("loaded_at", ts)
        )
        df.write.mode("overwrite").parquet(_bronze_path(base, name))
        expected[name] = int(obs.get["rows"])
        actual[name] = spark.read.parquet(_bronze_path(base, name)).count()
    recon = quality.reconcile_counts(expected, actual)
    if not recon["all_match"]:
        raise RuntimeError(f"bronze reconciliation failed: {recon}")
    return recon


def bronze_to_silver(
    spark: SparkSession,
    base: Path,
    run_ts: str | None = None,
    incremental: bool = False,
) -> None:
    """Cleanse + load. Full refresh for customers/products; anti-join
    incremental append for transactions/items when incremental=True
    (staging_to_production.py:152-181)."""
    read = lambda t: spark.read.parquet(_bronze_path(base, t)).drop("loaded_at")  # noqa: E731

    full = {
        "customers": cleanse.clean_customers(read("customers")),
        "products": cleanse.clean_products(read("products")),
    }
    for name, df in full.items():
        cleanse.with_audit_columns(df, run_ts).write.mode("overwrite").parquet(
            _silver_path(base, name)
        )

    # Transactions are partitioned by month — the lakehouse analog of the
    # reference's idx_transactions_date b-tree (create_production_schema.
    # sql:96-107, SURVEY.md §4): date-range reads (monitoring P5,
    # incremental loads) prune whole partitions at 100 TB.
    inc = {
        "transactions": (
            cleanse.clean_transactions(read("transactions")).withColumn(
                "txn_month", F.date_format("transaction_date", "yyyy-MM")
            ),
            "transaction_id",
            "txn_month",
        ),
        "transaction_items": (
            cleanse.clean_transaction_items(read("transaction_items")),
            "item_id",
            None,
        ),
    }
    for name, (df, key, part_col) in inc.items():
        target = _silver_path(base, name)
        existing: DataFrame | None = None
        if incremental and Path(target).exists():
            existing = spark.read.parquet(target)
            fresh = cleanse.incremental_append(df, existing, key)
            writer = cleanse.with_audit_columns(fresh, run_ts).write.mode("append")
        else:
            writer = cleanse.with_audit_columns(df, run_ts).write.mode("overwrite")
        if part_col:
            writer = writer.partitionBy(part_col)
        writer.parquet(target)


GOLD_TABLES = (
    "dim_customers",
    "dim_products",
    "dim_date",
    "dim_payment_method",
    "fact_sales",
    "agg_daily_sales",
    "agg_product_performance",
    "agg_customer_metrics",
)


def silver_to_gold(
    spark: SparkSession,
    base: Path,
    run_date: str,
    run_ts: str | None = None,
    atomic: bool = False,
) -> None:
    """Staged gold build: dims → fact → aggregates.

    The fact table is WRITTEN and RE-READ before the three aggregate
    tables are derived — otherwise each agg re-executes the whole 6-way
    fact join lineage (3× the most expensive plan in the pipeline).
    Materialize-then-derive is the standard checkpoint pattern for any
    multi-consumer intermediate at scale.

    ``atomic=True`` stages every table under a fresh gold version
    directory and commits them with one pointer swap
    (sources/maintenance.commit_version) — the cross-table transactional
    load the reference got from Postgres (X6): readers see the previous
    complete warehouse until all eight tables are staged.
    """
    import uuid as _uuid

    read = lambda t: spark.read.parquet(_silver_path(base, t))  # noqa: E731
    ts = F.lit(run_ts).cast("timestamp") if run_ts else F.current_timestamp()

    gold_root = base / "gold"
    if not atomic:
        from .sources.maintenance import CURRENT_POINTER

        if (gold_root / CURRENT_POINTER).exists():
            raise ValueError(
                "gold layer was published atomically (snapshot pointer "
                "present); rerun with atomic=True — published versions "
                "are immutable"
            )
    version = f"v-{_uuid.uuid4().hex}" if atomic else None
    target = (lambda name: str(gold_root / version / name)) if atomic else (
        lambda name: str(gold_root / name)
    )

    def write(name: str, df: DataFrame) -> None:
        # gold audit column: what the freshness monitor probes (Q7)
        df.withColumn("created_at", ts).write.mode("overwrite").parquet(
            target(name)
        )

    from concurrent.futures import ThreadPoolExecutor

    customers, products = read("customers"), read("products")
    transactions, items = read("transactions"), read("transaction_items")
    dim_c = warehouse.build_dim_customers(customers, run_date)
    dim_p = warehouse.build_dim_products(products, run_date)
    dim_d = warehouse.build_dim_date(transactions)
    dim_pm = warehouse.build_dim_payment_method(transactions)

    # the four dims (and later the three aggs) are independent — write
    # them as concurrent Spark jobs, same pattern as run_analytics
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(
            pool.map(
                lambda nd: write(*nd),
                [
                    ("dim_customers", dim_c),
                    ("dim_products", dim_p),
                    ("dim_date", dim_d),
                    ("dim_payment_method", dim_pm),
                ],
            )
        )

    write(
        "fact_sales",
        warehouse.build_fact_sales(items, transactions, products, dim_c, dim_p, dim_pm, dim_d),
    )
    fact = spark.read.parquet(target("fact_sales"))
    with ThreadPoolExecutor(max_workers=3) as pool:
        list(
            pool.map(
                lambda nd: write(*nd),
                [
                    ("agg_daily_sales", warehouse.build_agg_daily_sales(fact, dim_d)),
                    ("agg_product_performance", warehouse.build_agg_product_performance(fact, dim_p)),
                    ("agg_customer_metrics", warehouse.build_agg_customer_metrics(fact, dim_c)),
                ],
            )
        )

    if atomic:
        from .sources.maintenance import commit_version

        commit_version(gold_root, version, list(GOLD_TABLES))


def register_gold_views(spark: SparkSession, base: Path) -> None:
    for name in GOLD_TABLES:
        spark.read.parquet(_gold_path(base, name)).createOrReplaceTempView(name)


def run_quality_checks(spark: SparkSession, base: Path, out: Path) -> dict:
    read = lambda t: spark.read.parquet(_silver_path(base, t))  # noqa: E731
    suite = quality.ecommerce_check_suite(
        read("customers"), read("products"), read("transactions"), read("transaction_items")
    )
    report = suite.run()
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "quality_report.json", "w") as fh:
        json.dump(report, fh, indent=2)
    return report


def cleanup_old_files(root: Path, retention_days: int = 7, now_s: float | None = None) -> list[str]:
    """X5 retention cleanup (cleanup_old_data.py:75-111): delete files older
    than retention_days, preserving summary/report/metadata-named files."""
    now = now_s if now_s is not None else time.time()
    cutoff = now - retention_days * 86400
    removed: list[str] = []
    if not root.exists():
        return removed
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        if any(tag in p.name.lower() for tag in RETENTION_PRESERVE):
            continue
        if p.stat().st_mtime < cutoff:
            p.unlink()
            removed.append(str(p))
    return removed


def run_pipeline(
    spark: SparkSession,
    base_dir: str | Path,
    n_customers: int = 1000,
    n_products: int = 500,
    n_transactions: int = 10000,
    run_date: str = datagen.RUN_DATE,
    incremental: bool = False,
    backoff: list[float] | None = None,
    atomic_gold: bool = False,
) -> dict:
    """X1: the fixed 6-step linear DAG, fail-fast, with execution report
    (pipeline_orchestrator.py:46-53,130-161).  ``backoff`` overrides the
    default retry delays (config.pipeline.max_retries/retry_delay_seconds
    via config.PipelineConfig.backoff()); ``atomic_gold`` publishes the
    warehouse as one pointer-swapped snapshot (X6 cross-table
    atomicity)."""
    base = Path(base_dir)
    raw = base / "raw"
    report = PipelineReport()
    run_ts = f"{run_date} 00:00:00"

    def data_generation() -> None:
        from concurrent.futures import ThreadPoolExecutor

        raw.mkdir(parents=True, exist_ok=True)
        from .sources.registry import write as sink

        data = datagen.generate_all(
            spark, n_customers, n_products, n_transactions, run_date
        )
        # single CSV per table mirrors the reference's raw layer (S7);
        # the four writes are independent plans → concurrent Spark jobs,
        # same pattern as the gold build
        with ThreadPoolExecutor(max_workers=4) as pool:
            list(
                pool.map(
                    lambda kv: sink(kv[1], "csv_single", str(raw / f"{kv[0]}.csv")),
                    data.items(),
                )
            )
        meta = {
            "customers": n_customers,
            "products": n_products,
            "transactions": n_transactions,
            "run_date": run_date,
        }
        with open(raw / "generation_metadata.json", "w") as fh:
            json.dump(meta, fh, indent=2)

    # The reference's quality step validates the *production* tables
    # (validate_data.py connects to the production schema), so it must run
    # after staging_to_production — its own step list names it earlier only
    # because production persists across runs in Postgres.  With an
    # ephemeral lakehouse the dependency is made explicit.
    steps = [
        ("data_generation", data_generation),
        ("data_ingestion", lambda: ingest_to_bronze(spark, raw, base, run_ts)),
        (
            "staging_to_production",
            lambda: bronze_to_silver(spark, base, run_ts, incremental),
        ),
        ("data_quality_checks", lambda: run_quality_checks(spark, base, base / "reports")),
        (
            "warehouse_load",
            lambda: silver_to_gold(
                spark, base, run_date, run_ts, atomic=atomic_gold
            ),
        ),
        (
            "analytics_generation",
            lambda: (
                register_gold_views(spark, base),
                run_analytics(spark, base / "analytics", run_date),
            ),
        ),
    ]
    for name, fn in steps:
        if not run_step(
            name, fn, report, backoff if backoff is not None else RETRY_BACKOFF_S
        ):
            break  # fail-fast (pipeline_orchestrator.py:134-136)

    # monitoring runs even after a failed step — that is its job
    # (pipeline_monitor.py is a separate entry point in the reference)
    try:
        from datetime import datetime

        from . import monitor

        monitor.run_monitoring(
            spark,
            base,
            datetime.strptime(run_date, "%Y-%m-%d"),
            out=base / "reports",
        )
    except Exception:  # noqa: BLE001 — monitoring must not fail the run
        pass

    result = report.to_dict()
    reports_dir = base / "reports"
    reports_dir.mkdir(parents=True, exist_ok=True)
    with open(reports_dir / "pipeline_execution_report.json", "w") as fh:
        json.dump(result, fh, indent=2)
    return result


def main(argv: list[str] | None = None) -> int:
    """CLI entry point: python -m ecommerce_data_pipeline_23a91a05i4_spark.pipeline --base DIR
    (the in-process equivalent of the reference's
    `python scripts/pipeline_orchestrator.py`).

    ``--config config.yaml`` supplies defaults from the reference's
    config-file surface (data sizes, retry policy, schedule, retention);
    explicit CLI flags override it.  ``--schedule N`` runs the pipeline
    under the daily scheduler (N runs; the reference loops forever —
    pass a large N or wrap in a service manager)."""
    import argparse

    from .config import load_config
    from .session import get_spark

    ap = argparse.ArgumentParser(description="run the full lakehouse pipeline")
    ap.add_argument("--base", required=True, help="lakehouse output directory")
    ap.add_argument("--config", help="YAML/JSON config file (reference surface)")
    ap.add_argument("--customers", type=int, default=None)
    ap.add_argument("--products", type=int, default=None)
    ap.add_argument("--transactions", type=int, default=None)
    ap.add_argument("--run-date", default=None)
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument(
        "--atomic-gold",
        action="store_true",
        help="publish the warehouse as one pointer-swapped snapshot",
    )
    ap.add_argument(
        "--schedule",
        type=int,
        default=None,
        metavar="N",
        help="run under the daily scheduler for N runs instead of once",
    )
    args = ap.parse_args(argv)

    from .config import PipelineConfig

    cfg = load_config(args.config) if args.config else PipelineConfig()
    for section in cfg.ignored_sections:
        print(f"note: config section {section!r} is out of engine scope; ignored")
    customers = args.customers if args.customers is not None else cfg.customers
    products = args.products if args.products is not None else cfg.products
    transactions = (
        args.transactions if args.transactions is not None else cfg.transactions
    )
    run_date = args.run_date or cfg.run_date or datagen.RUN_DATE

    spark = get_spark("ecommerce-pipeline")

    def one_run() -> dict:
        return run_pipeline(
            spark,
            args.base,
            customers,
            products,
            transactions,
            run_date,
            args.incremental,
            backoff=cfg.backoff(),
            atomic_gold=args.atomic_gold or cfg.atomic_gold,
        )

    if args.schedule is not None:
        from .scheduler import run_daily

        run_daily(
            one_run,
            at=cfg.daily_run_time,
            cleanup_fn=lambda: cleanup_old_files(
                Path(args.base), cfg.retention_days
            ),
            max_runs=args.schedule,
        )
        return 0

    report = one_run()
    print(json.dumps(report, indent=2))
    return 0 if report["overall_status"] == "success" else 1


if __name__ == "__main__":
    raise SystemExit(main())
