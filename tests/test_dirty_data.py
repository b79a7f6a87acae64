"""Dirty-fixture coverage (FIXTURES.md: "a dirty variant of each table …
to make each quality check in SURVEY §2.9 observably fire") — every check
must detect its planted violation, and the cleanse filters must drop
exactly the rows the reference drops (staging_to_production.py:66,72)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators import cleanse, quality


@pytest.fixture(scope="module")
def dirty(spark):
    customers = spark.createDataFrame(
        [
            ("CUST0001", "katrina@example.net"),
            ("CUST0002", None),                    # null email
            ("CUST0003", ""),                      # empty email
            ("CUST0003", "dup.key@example.net"),   # duplicate customer_id
            ("CUST0004", "shared@example.net"),
            ("CUST0005", "shared@example.net"),    # duplicate email
        ],
        "customer_id string, email string",
    )
    products = spark.createDataFrame(
        [
            ("PROD0001", Decimal("100.00"), Decimal("60.00")),
            ("PROD0002", Decimal("0.00"), Decimal("0.00")),      # price <= 0
            ("PROD0003", None, Decimal("10.00")),                # null price
            ("PROD0004", Decimal("50.00"), Decimal("70.00")),    # cost >= price
        ],
        "product_id string, price decimal(10,2), cost decimal(10,2)",
    )
    transactions = spark.createDataFrame(
        [
            ("TXN000001", "CUST0001", Decimal("180.00")),
            ("TXN000002", "CUST0001", Decimal("-5.00")),   # nonpositive total
            ("TXN000003", "CUST9999", Decimal("10.00")),   # orphan customer
            ("TXN000004", "CUST0001", Decimal("99.99")),   # total != item sum
            ("TXN000005", "CUST0001", Decimal("50.00")),   # no items
        ],
        "transaction_id string, customer_id string, total_amount decimal(12,2)",
    )
    items = spark.createDataFrame(
        [
            ("ITEM000001", "TXN000001", "PROD0001", 2, Decimal("100.00"), Decimal("10.00"), Decimal("180.00")),
            ("ITEM000002", "TXN000002", "PROD0001", 0, Decimal("100.00"), Decimal("0.00"), Decimal("0.00")),     # qty <= 0
            ("ITEM000003", "TXN000003", "PROD0001", 1, Decimal("10.00"), Decimal("150.00"), Decimal("10.00")),   # discount > 100
            ("ITEM000004", "TXN000004", "PROD0001", 1, Decimal("100.00"), Decimal("0.00"), Decimal("77.77")),    # line_total wrong
            ("ITEM000005", "TXN999999", "PROD0001", 1, Decimal("10.00"), Decimal("0.00"), Decimal("10.00")),     # orphan txn
            ("ITEM000006", "TXN000001", "PROD9999", 1, Decimal("10.00"), Decimal("0.00"), Decimal("10.00")),     # orphan product
        ],
        "item_id string, transaction_id string, product_id string, quantity int, "
        "unit_price decimal(10,2), discount_percentage decimal(5,2), line_total decimal(12,2)",
    )
    return customers, products, transactions, items


def test_every_quality_check_fires(dirty):
    customers, products, transactions, items = dirty
    report = quality.ecommerce_check_suite(customers, products, transactions, items).run()
    checks = report["checks"]
    # each planted violation class is detected at least once
    for name in (
        "null_emails",
        "null_prices",
        "transactions_without_items",
        "duplicate_customer_ids",
        "duplicate_emails",
        "nonpositive_prices",
        "invalid_discounts",
        "nonpositive_quantities",
        "cost_not_below_price",
        "line_total_mismatches",
        "transaction_total_mismatches",
        "orphan_transactions",
        "orphan_items_transaction",
        "orphan_items_product",
    ):
        assert checks[name] >= 1, (name, checks)
    assert report["total_violations"] >= 14
    assert report["quality_score"] < 100.0
    assert report["quality_grade"] == "A"  # (1 - 16/50000)*100 ≈ 99.97


def test_cleanse_filters_drop_exactly_reference_rows(dirty):
    _, _, transactions, items = dirty
    kept_txn = {r.transaction_id for r in cleanse.clean_transactions(transactions).collect()}
    assert "TXN000002" not in kept_txn          # total_amount <= 0 dropped (P3)
    assert kept_txn == {"TXN000001", "TXN000003", "TXN000004", "TXN000005"}
    kept_items = {r.item_id for r in cleanse.clean_transaction_items(items).collect()}
    assert "ITEM000002" not in kept_items       # quantity <= 0 dropped (P4)
    assert len(kept_items) == 5


def test_scoring_degrades_with_violation_mass():
    assert quality.quality_score(0) == 100.0
    assert quality.quality_score(25000) == 50.0
    assert quality.quality_score(100000) == 0.0
    assert quality.quality_grade(96) == "A"
    assert quality.quality_grade(90) == "B"
    assert quality.quality_grade(75) == "C"
    assert quality.quality_grade(50) == "D"
