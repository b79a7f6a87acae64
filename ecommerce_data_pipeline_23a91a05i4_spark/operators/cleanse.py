"""Staging → production cleansing transforms (reference:
scripts/transformation/staging_to_production.py:20-106).

Every reference transform is a native Spark column expression — the
reference's row-wise pandas .apply lambdas (its de-facto UDF surface,
SURVEY.md §2.11) need no Python here, which is what keeps this layer
whole-stage-codegen at 100 TB.

Semantic notes (SURVEY.md §4 potholes):
- F4: Python str.title() vs Spark initcap differ on apostrophe names
  ("o'brien" → "O'Brien" vs "O'brien"); initcap is used and documented.
- P10: production price_category uses the PANDAS thresholds (50/200,
  staging_to_production.py:52-56).  The warehouse dimension uses the SQL
  thresholds (500/2000) — both are faithfully kept (see warehouse.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _trim_strings(df: DataFrame) -> DataFrame:
    """F1: strip every string column (pandas .str.strip() on object cols)."""
    out = df
    for f in df.schema.fields:
        if f.dataType.typeName() == "string":
            out = out.withColumn(f.name, F.trim(F.col(f.name)))
    return out


def production_price_category(price: Column) -> Column:
    """Pandas-side bucketing at 50/200 (staging_to_production.py:52-56)."""
    return (
        F.when(price < 50, "Budget")
        .when(price < 200, "Mid-range")
        .otherwise("Premium")
    )


def warehouse_price_category(price: Column) -> Column:
    """SQL-side bucketing at 500/2000 (load_warehouse.py:112-115) —
    intentionally a DIFFERENT function from the production one."""
    return (
        F.when(price < 500, "Low").when(price < 2000, "Medium").otherwise("High")
    )


def warehouse_price_range(price: Column) -> Column:
    """load_warehouse.py:116-121."""
    return (
        F.when(price < 500, "0-500")
        .when(price < 2000, "500-2000")
        .otherwise("2000+")
    )


def clean_customers(df: DataFrame) -> DataFrame:
    """staging_to_production.py:20-37: trim, lowercase email, strip
    non-digits from phone, title-case names."""
    return (
        _trim_strings(df)
        .withColumn("email", F.lower(F.col("email")))
        .withColumn("phone", F.regexp_replace(F.col("phone"), r"\D", ""))
        .withColumn("first_name", F.initcap(F.col("first_name")))
        .withColumn("last_name", F.initcap(F.col("last_name")))
    )


def clean_products(df: DataFrame) -> DataFrame:
    """staging_to_production.py:40-60: trim, round money, derive
    profit_margin (P9) and the pandas-threshold price_category (P10)."""
    price = F.col("price")
    return (
        _trim_strings(df)
        .withColumn("price", F.round(price, 2).cast("decimal(10,2)"))
        .withColumn("cost", F.round(F.col("cost"), 2).cast("decimal(10,2)"))
        .withColumn(
            "profit_margin",
            F.round((price - F.col("cost")) / price * 100, 2).cast("decimal(5,2)"),
        )
        .withColumn("price_category", production_price_category(price))
    )


def clean_transactions(df: DataFrame) -> DataFrame:
    """staging_to_production.py:63-68: drop non-positive totals (P3)."""
    return _trim_strings(df).filter(F.col("total_amount") > 0)


def clean_transaction_items(df: DataFrame) -> DataFrame:
    """staging_to_production.py:71-79: drop non-positive quantities (P4),
    recompute line_total (P9) and discount_amount."""
    recomputed = F.round(
        F.col("quantity") * F.col("unit_price") * (1 - F.col("discount_percentage") / 100),
        2,
    ).cast("decimal(12,2)")
    return (
        _trim_strings(df)
        .filter(F.col("quantity") > 0)
        .withColumn("line_total", recomputed)
        .withColumn(
            "discount_amount",
            F.round(
                F.col("unit_price") * F.col("quantity") - F.col("line_total"), 2
            ).cast("decimal(12,2)"),
        )
    )


def with_audit_columns(df: DataFrame, run_ts: str | None = None) -> DataFrame:
    """created_at/updated_at audit columns (production DDL :23-24).  A fixed
    run_ts keeps test output deterministic (F12)."""
    ts = F.lit(run_ts).cast("timestamp") if run_ts else F.current_timestamp()
    return df.withColumn("created_at", ts).withColumn("updated_at", ts)


def incremental_append(
    staged: DataFrame, existing: DataFrame | None, key: str
) -> DataFrame:
    """J4: anti-join incremental load (staging_to_production.py:160-181) —
    keep only staged rows whose key is absent from the target, without ever
    collecting the key set to the driver."""
    if existing is None:
        return staged
    return staged.join(existing.select(key), key, "left_anti")
