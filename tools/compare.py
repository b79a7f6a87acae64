"""Local stand-in for the driver's correctness gate.

Runs every entry of ``__spark_entry__.queries()`` and its DuckDB oracle on
the same sf dir, sorts columns by name and rows by value, then compares
row-count, dtypes and values.  Used while iterating so mismatches are caught
before the driver records CORRECTNESS_r{N}.json.

Usage:  python tools/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from ecommerce_data_pipeline_23a91a05i4_spark.catalog import TABLE_NAMES  # noqa: E402
from ecommerce_data_pipeline_23a91a05i4_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df):
    """Sort columns by name, then rows by all values (as strings)."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def compare_one(spark, con, name, fn, sql, sf_dir) -> list[str]:
    problems: list[str] = []
    sdf = fn(spark, sf_dir)
    spark_pd = sdf.toPandas()
    if sql is None:
        problems.append(f"(rows-only) {len(spark_pd)} rows")
        return problems
    duck_pd = con.execute(sql).fetchdf()

    if len(spark_pd) != len(duck_pd):
        problems.append(f"ROWCOUNT spark={len(spark_pd)} duck={len(duck_pd)}")
    s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if s_cols != d_cols:
        problems.append(f"COLUMNS spark={s_cols} duck={d_cols}")
        return problems
    a, b = normalize(spark_pd), normalize(duck_pd)
    if len(a) == len(b):
        bad = 0
        for col in a.columns:
            for i, (x, y) in enumerate(zip(a[col], b[col])):
                if not values_equal(x, y):
                    bad += 1
                    if bad <= 5:
                        problems.append(f"VALUE row {i} col {col}: spark={x!r} duck={y!r}")
        if bad > 5:
            problems.append(f"... {bad} mismatched values total")
    # dtype drift that would break the driver's schema check
    for col in a.columns:
        sk, dk = a[col].dtype.kind, b[col].dtype.kind
        if sk != dk:
            problems.append(f"DTYPE col {col}: spark={a[col].dtype} duck={b[col].dtype}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("compare-harness")
    con = duck_connection(sf_dir)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            problems = compare_one(spark, con, name, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: EXCEPTION {type(e).__name__}: {e}")
            failures += 1
            continue
        real = [p for p in problems if not p.startswith("(rows-only)")]
        if real:
            failures += 1
            print(f"FAIL  {name}")
            for p in problems:
                print(f"      {p}")
        else:
            note = problems[0] if problems else "ok"
            print(f"OK    {name}  {note}")
    print(f"\n{failures} failures / {len(queries)} queries @ {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
