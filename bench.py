"""Benchmark runner: executes the headline analytics suite and prints ONE
JSON line for the driver (BENCH_r{N}.json).

Comparable baseline: the reference's 10-query suite ran in 4.44 s total at
SF-ref (~30k fact rows) on warm PostgreSQL (BASELINE.md).  Here each query is
run once to warm the engine (whole-stage-codegen compilation, parquet
footers, OS page cache — the analog of Postgres's plan/buffer caches and
the reference's warm-connection measurement), then timed, including result
materialization (collect), which the reference's pandas read_sql also
includes.  JVM startup is excluded per BASELINE.md's acceptance note.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_data_pipeline_23a91a05i4_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("bench")
    queries = entry_mod.queries()

    # One failing query must never forfeit the suite: every query is
    # individually guarded and the JSON line is always emitted, with
    # per-query errors recorded instead of timings.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
            df.collect()  # warm: codegen compile, footer reads, page cache
            t0 = time.perf_counter()
            df.collect()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001 — record and keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    # Headline value = the 10-query analytics suite, the number BASELINE.md
    # reports for the reference (4.44 s at ~30k fact rows).  The monitoring
    # (q11+) and LLM-data (t*) suites are timed in "queries" but kept out
    # of the headline so the comparison stays apples-to-apples.
    ref10 = [n for n in timings if n.startswith("q") and int(n[1:].split("_")[0]) <= 10]
    total = round(sum(timings[n] for n in ref10), 4)

    # End-to-end pipeline at the reference's exact scale (1000 customers /
    # 500 products / 10k transactions) — per-step seconds comparable to
    # BASELINE.md (data_generation 3.36s, data_ingestion 4.61s, analytics
    # suite 4.44s on local Postgres).
    import shutil
    import tempfile

    from ecommerce_data_pipeline_23a91a05i4_spark.pipeline import run_pipeline

    base = tempfile.mkdtemp(prefix="bench_pipeline_")
    steps: dict[str, float] = {}
    pipeline_ok = False
    try:
        rep = run_pipeline(spark, base, 1000, 500, 10000)
        steps = {
            name: info["duration_seconds"]
            for name, info in rep["steps_executed"].items()
        }
        pipeline_ok = rep["overall_status"] == "success"
    except Exception as exc:  # noqa: BLE001 — still emit the JSON line
        errors["__pipeline__"] = f"{type(exc).__name__}: {exc}"[:500]
    finally:
        shutil.rmtree(base, ignore_errors=True)

    out = {
        "metric": "ref_analytics10_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "all_queries_total_sec": round(sum(timings.values()), 4),
        "pipeline_sf_ref_steps_sec": steps,
        "pipeline_sf_ref_ok": pipeline_ok,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
