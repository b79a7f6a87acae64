"""Data-quality check library (reference:
scripts/quality_checks/validate_data.py:40-177 and
sql/queries/data_quality_checks.sql).

Each check is a named closure over DataFrames returning a violation count;
``run_checks`` evaluates a suite and scores it with the reference's exact
constants: score = max(0, (1 - violations/50000)·100), grades A/B/C/D at
95/85/70 (validate_data.py:22-25 — the magic 50000 is kept for parity).

All checks are distributed (filter/groupBy/left_anti + count) — no
collect of anything larger than a scalar.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_DENOMINATOR = 50000  # validate_data.py:23
GRADE_THRESHOLDS = ((95, "A"), (85, "B"), (70, "C"))  # validate_data.py:25


def null_or_empty_count(df: DataFrame, col: str) -> int:
    """Q1 completeness (data_quality_checks.sql:6-12)."""
    return df.filter(F.col(col).isNull() | (F.col(col) == "")).count()


def missing_children_count(parent: DataFrame, child: DataFrame, key: str) -> int:
    """Q1: parents with no children, e.g. transactions without items
    (data_quality_checks.sql:15-19)."""
    return parent.join(child.select(key), key, "left_anti").count()


def duplicate_key_count(df: DataFrame, col: str) -> int:
    """Q2 uniqueness (data_quality_checks.sql:27-36, A6 HAVING shape):
    number of key values appearing more than once."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )


def out_of_range_count(df: DataFrame, predicate) -> int:
    """Q3 validity (data_quality_checks.sql:44-56): rows violating a
    range predicate (pass the VIOLATION condition)."""
    return df.filter(predicate).count()


def line_total_mismatch_count(items: DataFrame, tolerance: float = 0.01) -> int:
    """Q4 consistency (data_quality_checks.sql:64-66, P8): recomputed
    line_total off by more than ±0.01."""
    expected = F.col("quantity") * F.col("unit_price") * (
        1 - F.col("discount_percentage") / 100
    )
    return items.filter(
        F.abs(F.col("line_total") - expected) > tolerance
    ).count()


def transaction_total_mismatch_count(
    transactions: DataFrame, items: DataFrame, tolerance: float = 0.01
) -> int:
    """Q4: total_amount vs SUM(line_total) per transaction (J5 shape —
    join on an aggregated subquery, data_quality_checks.sql:69-76)."""
    sums = items.groupBy("transaction_id").agg(
        F.sum("line_total").alias("items_total")
    )
    return (
        transactions.join(sums, "transaction_id")
        .filter(F.abs(F.col("total_amount") - F.col("items_total")) > tolerance)
        .count()
    )


def orphan_count(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> int:
    """Q5 referential integrity (data_quality_checks.sql:89-107, J3)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    ).count()


def quality_score(total_violations: int) -> float:
    """Q6 scoring — reference constants preserved (validate_data.py:22-25)."""
    return max(0.0, (1 - total_violations / SCORE_DENOMINATOR) * 100)


def quality_grade(score: float) -> str:
    for threshold, grade in GRADE_THRESHOLDS:
        if score >= threshold:
            return grade
    return "D"


@dataclass
class CheckSuite:
    """Named check registry → scored report (validate_data.py:162-183)."""

    checks: dict[str, Callable[[], int]] = field(default_factory=dict)

    def add(self, name: str, fn: Callable[[], int]) -> "CheckSuite":
        self.checks[name] = fn
        return self

    def run(self) -> dict:
        results = {name: int(fn()) for name, fn in self.checks.items()}
        total = sum(results.values())
        score = quality_score(total)
        return {
            "checks": results,
            "total_violations": total,
            "quality_score": round(score, 2),
            "quality_grade": quality_grade(score),
        }


def ecommerce_check_suite(
    customers: DataFrame,
    products: DataFrame,
    transactions: DataFrame,
    items: DataFrame,
) -> CheckSuite:
    """The reference's full validation suite wired to the four production
    tables (validate_data.py:40-157)."""
    s = CheckSuite()
    s.add("null_emails", lambda: null_or_empty_count(customers, "email"))
    s.add("null_prices", lambda: products.filter(F.col("price").isNull()).count())
    s.add(
        "transactions_without_items",
        lambda: missing_children_count(transactions, items, "transaction_id"),
    )
    s.add("duplicate_customer_ids", lambda: duplicate_key_count(customers, "customer_id"))
    s.add("duplicate_emails", lambda: duplicate_key_count(customers, "email"))
    s.add(
        "nonpositive_prices",
        lambda: out_of_range_count(products, F.col("price") <= 0),
    )
    s.add(
        "invalid_discounts",
        lambda: out_of_range_count(
            items,
            (F.col("discount_percentage") < 0) | (F.col("discount_percentage") > 100),
        ),
    )
    s.add(
        "nonpositive_quantities",
        lambda: out_of_range_count(items, F.col("quantity") <= 0),
    )
    s.add(
        "cost_not_below_price",
        lambda: out_of_range_count(products, F.col("cost") >= F.col("price")),
    )
    s.add("line_total_mismatches", lambda: line_total_mismatch_count(items))
    s.add(
        "transaction_total_mismatches",
        lambda: transaction_total_mismatch_count(transactions, items),
    )
    s.add(
        "orphan_transactions",
        lambda: orphan_count(transactions, "customer_id", customers, "customer_id"),
    )
    s.add(
        "orphan_items_transaction",
        lambda: orphan_count(items, "transaction_id", transactions, "transaction_id"),
    )
    s.add(
        "orphan_items_product",
        lambda: orphan_count(items, "product_id", products, "product_id"),
    )
    return s


def reconcile_counts(expected: dict[str, int], actual: dict[str, int]) -> dict:
    """Q11 staging-load reconciliation (ingest_to_staging.py:93-119):
    per-table expected vs actual row counts, overall AND."""
    tables = {
        name: {
            "expected": expected[name],
            "actual": actual.get(name, -1),
            "match": expected[name] == actual.get(name, -1),
        }
        for name in expected
    }
    return {"tables": tables, "all_match": all(t["match"] for t in tables.values())}
