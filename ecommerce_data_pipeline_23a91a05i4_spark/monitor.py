"""Pipeline monitoring (reference:
scripts/monitoring/pipeline_monitor.py:143-266 and
sql/queries/monitoring_queries.sql).

Four probes rolled into a health report (Q7-Q10):
- freshness: MAX(audit timestamp) per layer vs staleness thresholds
  (24h staging / 1h production / 1h warehouse — pipeline_monitor.py:143-159)
- volume anomaly: last-30-days daily transaction counts, 3-sigma band
  (pipeline_monitor.py:170-189)
- warehouse integrity: null surrogate keys in the fact table
  (monitoring_queries.sql:41-44)
- health rollup: alerts → healthy/degraded/critical + 100-violations score
  (pipeline_monitor.py:194-263)

Everything scalar-producing is a distributed agg; only scalars reach the
driver.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRESHNESS_THRESHOLDS_H = {"bronze": 24, "silver": 1, "gold": 1}


def layer_freshness(
    dfs: dict[str, tuple[DataFrame, str]], as_of: datetime
) -> dict:
    """dfs: layer -> (DataFrame, audit column).  U1/A5 labeled MAX scan."""
    out = {}
    for layer, (df, col) in dfs.items():
        latest = df.agg(F.max(col)).collect()[0][0]
        lag_h = (as_of - latest).total_seconds() / 3600 if latest else None
        threshold = FRESHNESS_THRESHOLDS_H.get(layer, 24)
        out[layer] = {
            "latest": str(latest) if latest else None,
            "lag_hours": round(lag_h, 2) if lag_h is not None else None,
            "stale": lag_h is None or lag_h > threshold,
        }
    return out


def volume_anomaly(
    df: DataFrame, date_col: str, as_of: datetime, lookback_days: int = 30
) -> dict:
    """3-sigma daily-volume test over the lookback window (P5 date-range
    predicate + A9 mean/stddev).  The flag math runs distributed; only the
    per-day flags (≤ lookback_days rows) are collected."""
    window_start = (as_of - timedelta(days=lookback_days)).date()
    daily = (
        df.filter(F.col(date_col) >= F.lit(str(window_start)))
        .groupBy(F.col(date_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("days"),
        F.avg("n").alias("mean"),
        F.stddev_samp("n").alias("std"),
    ).collect()[0]
    if not stats["days"] or stats["std"] is None:
        return {"days": int(stats["days"] or 0), "anomalies": []}
    lo = stats["mean"] - 3 * stats["std"]
    hi = stats["mean"] + 3 * stats["std"]
    anomalies = [
        {
            "date": str(r["d"]),
            "count": int(r["n"]),
            "type": "spike" if r["n"] > hi else "drop",
        }
        for r in daily.filter((F.col("n") > hi) | (F.col("n") < lo)).collect()
    ]
    return {
        "days": int(stats["days"]),
        "mean": round(float(stats["mean"]), 2),
        "stddev": round(float(stats["std"]), 2),
        "anomalies": anomalies,
    }


def warehouse_null_keys(fact: DataFrame) -> dict:
    """Q9: null surrogate keys in fact_sales — one pass, conditional sums."""
    row = fact.agg(
        *[
            F.sum(F.when(F.col(k).isNull(), 1).otherwise(0)).alias(k)
            for k in ("customer_key", "product_key", "date_key")
        ]
    ).collect()[0]
    return {k: int(row[k] or 0) for k in ("customer_key", "product_key", "date_key")}


def health_rollup(
    freshness: dict, volumes: dict, null_keys: dict
) -> dict:
    """Q10: alerts → status + score (pipeline_monitor.py:194-263)."""
    alerts: list[str] = []
    for layer, f in freshness.items():
        if f["stale"]:
            alerts.append(f"stale_{layer}")
    for a in volumes.get("anomalies", []):
        alerts.append(f"volume_{a['type']}_{a['date']}")
    violations = sum(null_keys.values())
    if violations:
        alerts.append("warehouse_null_keys")
    status = (
        "critical" if len(alerts) > 2 else "degraded" if alerts else "healthy"
    )
    return {
        "status": status,
        "alerts": alerts,
        "quality_score": max(0, 100 - violations),
    }


def run_monitoring(
    spark: SparkSession,
    base: Path,
    as_of: datetime,
    out: Path | None = None,
    lookback_days: int = 30,
) -> dict:
    from .sources.maintenance import resolve_table_path

    # snapshot-pointer-aware: gold may be an atomically-published version
    read = lambda layer, t: spark.read.parquet(  # noqa: E731
        resolve_table_path(base / layer, t)
    )
    freshness = layer_freshness(
        {
            "bronze": (read("bronze", "transactions"), "loaded_at"),
            "silver": (read("silver", "transactions"), "created_at"),
            "gold": (read("gold", "fact_sales"), "created_at"),
        },
        as_of,
    )
    volumes = volume_anomaly(
        read("silver", "transactions"), "transaction_date", as_of, lookback_days
    )
    nulls = warehouse_null_keys(read("gold", "fact_sales"))
    report = {
        "generated_at": str(as_of),
        "freshness": freshness,
        "volume": volumes,
        "warehouse_null_keys": nulls,
        "health": health_rollup(freshness, volumes, nulls),
    }
    if out:
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "monitoring_report.json", "w") as fh:
            json.dump(report, fh, indent=2)
    return report
