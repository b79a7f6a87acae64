"""Silver cleansing transforms vs the reference's invariants
(staging_to_production.py semantics; tests/test_transformation.py spirit)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators import cleanse


def _customers(spark):
    return spark.createDataFrame(
        [
            ("CUST0001", "  zachary ", "MOORE", "  Katrina20@Example.NET ", "876-264-0295"),
            ("CUST0002", "o'brien", "smith", "A@B.COM", "+1 (555) 123 4567"),
        ],
        ["customer_id", "first_name", "last_name", "email", "phone"],
    )


def test_clean_customers_trims_lowers_strips(spark):
    rows = {r.customer_id: r for r in cleanse.clean_customers(_customers(spark)).collect()}
    r1 = rows["CUST0001"]
    assert r1.email == "katrina20@example.net"          # F2 lower
    assert r1.phone == "8762640295"                      # F3 digits only
    assert r1.first_name == "Zachary"                    # F4 title-case
    r2 = rows["CUST0002"]
    assert r2.phone == "15551234567"
    # documented initcap-vs-title divergence (SURVEY.md F4)
    assert r2.first_name == "O'brien"


def test_clean_products_derives_margin_and_category(spark):
    df = spark.createDataFrame(
        [
            ("P1", Decimal("40.00"), Decimal("20.00")),
            ("P2", Decimal("150.00"), Decimal("75.00")),
            ("P3", Decimal("2500.00"), Decimal("1250.00")),
        ],
        "product_id string, price decimal(10,2), cost decimal(10,2)",
    )
    out = {r.product_id: r for r in cleanse.clean_products(df).collect()}
    # pandas thresholds 50/200 (NOT the warehouse 500/2000)
    assert out["P1"].price_category == "Budget"
    assert out["P2"].price_category == "Mid-range"
    assert out["P3"].price_category == "Premium"
    assert out["P1"].profit_margin == Decimal("50.00")


def test_clean_transactions_drops_nonpositive(spark):
    df = spark.createDataFrame(
        [("T1", Decimal("10.00")), ("T2", Decimal("0.00")), ("T3", Decimal("-5.00"))],
        "transaction_id string, total_amount decimal(12,2)",
    )
    kept = [r.transaction_id for r in cleanse.clean_transactions(df).collect()]
    assert kept == ["T1"]


def test_clean_items_recomputes_line_total(spark):
    df = spark.createDataFrame(
        [("I1", 2, Decimal("10.00"), Decimal("10.00"), Decimal("99.99"))],
        "item_id string, quantity int, unit_price decimal(10,2), "
        "discount_percentage decimal(5,2), line_total decimal(12,2)",
    )
    r = cleanse.clean_transaction_items(df).collect()[0]
    assert r.line_total == Decimal("18.00")     # 2*10*(1-0.10), P9 recompute
    assert r.discount_amount == Decimal("2.00")


def test_incremental_append_is_anti_join(spark):
    staged = spark.createDataFrame([("A",), ("B",), ("C",)], ["k"])
    existing = spark.createDataFrame([("B",)], ["k"])
    got = sorted(
        r.k for r in cleanse.incremental_append(staged, existing, "k").collect()
    )
    assert got == ["A", "C"]
