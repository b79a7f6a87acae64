"""Explicit StructTypes for the ecommerce table surface, transcribed from
the reference DDLs (sql/ddl/create_staging_schema.sql:17-76,
create_production_schema.sql:12-89, create_warehouse_schema.sql:9-128).

Schemas are applied at CSV read (spark.read.schema(...)) instead of
inference so the DDL's types are authoritative (SURVEY.md §1.2).  DECIMAL
is kept for money (quality checks compare at ±0.01); TIME becomes a
"HH:mm:ss" string (Spark has no TimeType; the column is storage-only).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


CUSTOMERS = StructType([
    _f("customer_id", StringType(), False),
    _f("first_name", StringType()),
    _f("last_name", StringType()),
    _f("email", StringType()),
    _f("phone", StringType()),
    _f("registration_date", DateType()),
    _f("city", StringType()),
    _f("state", StringType()),
    _f("country", StringType()),
    _f("age_group", StringType()),
])

PRODUCTS = StructType([
    _f("product_id", StringType(), False),
    _f("product_name", StringType()),
    _f("category", StringType()),
    _f("sub_category", StringType()),
    _f("price", DecimalType(10, 2)),
    _f("cost", DecimalType(10, 2)),
    _f("brand", StringType()),
    _f("stock_quantity", IntegerType()),
    _f("supplier_id", StringType()),
])

TRANSACTIONS = StructType([
    _f("transaction_id", StringType(), False),
    _f("customer_id", StringType()),
    _f("transaction_date", DateType()),
    _f("transaction_time", StringType()),  # SQL TIME → "HH:mm:ss"
    _f("payment_method", StringType()),
    _f("shipping_address", StringType()),
    _f("total_amount", DecimalType(12, 2)),
])

TRANSACTION_ITEMS = StructType([
    _f("item_id", StringType(), False),
    _f("transaction_id", StringType()),
    _f("product_id", StringType()),
    _f("quantity", IntegerType()),
    _f("unit_price", DecimalType(10, 2)),
    _f("discount_percentage", DecimalType(5, 2)),
    _f("line_total", DecimalType(12, 2)),
])

STAGING = {
    "customers": CUSTOMERS,
    "products": PRODUCTS,
    "transactions": TRANSACTIONS,
    "transaction_items": TRANSACTION_ITEMS,
}


def with_audit(schema: StructType, *cols: str) -> StructType:
    """Append audit timestamp columns (loaded_at / created_at / updated_at,
    DDL DEFAULT CURRENT_TIMESTAMP — create_staging_schema.sql:28)."""
    fields = list(schema.fields)
    for c in cols:
        fields.append(_f(c, TimestampType()))
    return StructType(fields)


# Production adds derived columns on products
# (create_production_schema.sql:39-40) and audit columns everywhere.
PRODUCTION_EXTRA_PRODUCT_FIELDS = [
    _f("profit_margin", DecimalType(5, 2)),
    _f("price_category", StringType()),
]

DIM_CUSTOMERS = StructType([
    _f("customer_key", IntegerType(), False),
    _f("customer_id", StringType(), False),
    _f("full_name", StringType()),
    _f("email", StringType()),
    _f("phone", StringType()),
    _f("city", StringType()),
    _f("state", StringType()),
    _f("country", StringType()),
    _f("age_group", StringType()),
    _f("registration_date", DateType()),
    _f("effective_date", DateType()),
    _f("end_date", DateType()),
    _f("is_current", BooleanType()),
])

DIM_PRODUCTS = StructType([
    _f("product_key", IntegerType(), False),
    _f("product_id", StringType(), False),
    _f("product_name", StringType()),
    _f("category", StringType()),
    _f("sub_category", StringType()),
    _f("brand", StringType()),
    _f("price", DecimalType(10, 2)),
    _f("cost", DecimalType(10, 2)),
    _f("profit_margin", DecimalType(5, 2)),
    _f("price_category", StringType()),
    _f("price_range", StringType()),
    _f("effective_date", DateType()),
    _f("end_date", DateType()),
    _f("is_current", BooleanType()),
])

DIM_DATE = StructType([
    _f("date_key", IntegerType(), False),
    _f("full_date", DateType(), False),
    _f("year", IntegerType()),
    _f("quarter", IntegerType()),
    _f("month", IntegerType()),
    _f("month_name", StringType()),
    _f("day", IntegerType()),
    _f("day_name", StringType()),
    _f("week", IntegerType()),
    _f("is_weekend", BooleanType()),
])

DIM_PAYMENT_METHOD = StructType([
    _f("payment_method_key", IntegerType(), False),
    _f("payment_method_name", StringType(), False),
])

FACT_SALES = StructType([
    _f("sales_key", IntegerType(), False),
    _f("transaction_id", StringType()),
    _f("customer_key", IntegerType()),
    _f("product_key", IntegerType()),
    _f("date_key", IntegerType()),
    _f("payment_method_key", IntegerType()),
    _f("quantity", IntegerType()),
    _f("unit_price", DecimalType(10, 2)),
    _f("discount_percentage", DecimalType(5, 2)),
    _f("discount_amount", DecimalType(12, 2)),
    _f("line_total", DecimalType(12, 2)),
    _f("profit", DecimalType(12, 2)),
])
