"""Star-schema warehouse build (reference:
scripts/transformation/load_warehouse.py:54-248).

The reference round-trips every row server→client→server through psycopg2
(cur.fetchall + execute_values, load_warehouse.py:33-48) — its biggest
scalability sin.  Here each table is one distributed read → transform →
write plan; the fact build is a single Catalyst tree where every dimension
side is broadcast (J1).

Surrogate keys: SERIAL becomes a deterministic dense sequence over the
business key (SURVEY.md §1.2 rules out monotonically_increasing_id).
Dimensions use a plain global row_number — they are dimension-sized by
construction, so the single-partition window is bounded.  The FACT key
(sales_key) is the 100 TB column: it uses operators/keys.dense_sequence,
which adaptively switches from a bounded global window (small inputs) to
a fully distributed numbering (range-partition → local row_number →
broadcast partition offsets) once the fact exceeds the 4M-row threshold.

SCD2 shape: the reference *declares* SCD2 but truncate-reloads with
effective_date = run date, end_date NULL, is_current TRUE
(load_warehouse.py:72-76) — reproduced faithfully; true SCD2 merge is an
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .operators.cleanse import warehouse_price_category, warehouse_price_range
from .operators.keys import dense_sequence

RUN_DATE = "2024-01-01"


def _surrogate(df: DataFrame, key_name: str, order_col: str) -> DataFrame:
    w = Window.orderBy(order_col)
    return df.withColumn(key_name, F.row_number().over(w).cast("int"))


def build_dim_customers(customers: DataFrame, run_date: str = RUN_DATE) -> DataFrame:
    """load_warehouse.py:62-78."""
    return _surrogate(customers, "customer_key", "customer_id").select(
        "customer_key",
        "customer_id",
        F.concat_ws(" ", "first_name", "last_name").alias("full_name"),
        "email",
        "phone",
        "city",
        "state",
        "country",
        "age_group",
        "registration_date",
        F.lit(run_date).cast("date").alias("effective_date"),
        F.lit(None).cast("date").alias("end_date"),
        F.lit(True).alias("is_current"),
    )


def build_dim_products(products: DataFrame, run_date: str = RUN_DATE) -> DataFrame:
    """load_warehouse.py:86-124 — note the SQL-threshold price_category
    (500/2000), different from production's pandas thresholds (50/200)."""
    price = F.col("price")
    return _surrogate(products, "product_key", "product_id").select(
        "product_key",
        "product_id",
        "product_name",
        "category",
        "sub_category",
        "brand",
        "price",
        "cost",
        F.round((price - F.col("cost")) / price * 100, 2)
        .cast("decimal(5,2)")
        .alias("profit_margin"),
        warehouse_price_category(price).alias("price_category"),
        warehouse_price_range(price).alias("price_range"),
        F.lit(run_date).cast("date").alias("effective_date"),
        F.lit(None).cast("date").alias("end_date"),
        F.lit(True).alias("is_current"),
    )


def build_dim_date(transactions: DataFrame) -> DataFrame:
    """load_warehouse.py:146-166: calendar rows for the distinct
    transaction dates.  F9-F11 mappings with the documented potholes:
    ISODOW weekend = (Sat, Sun); month/day names unpadded (Postgres
    TO_CHAR blank-pads to 9 chars — normalized away here)."""
    d = F.col("full_date")
    return (
        transactions.select(F.col("transaction_date").alias("full_date"))
        .distinct()
        .select(
            F.date_format(d, "yyyyMMdd").cast("int").alias("date_key"),
            "full_date",
            F.year(d).cast("int").alias("year"),
            F.quarter(d).cast("int").alias("quarter"),
            F.month(d).cast("int").alias("month"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.dayofmonth(d).cast("int").alias("day"),
            F.date_format(d, "EEEE").alias("day_name"),
            F.weekofyear(d).cast("int").alias("week"),
            # EXTRACT(ISODOW) IN (6,7) — Spark weekday(): Monday=0..Sunday=6
            (F.weekday(d) >= 5).alias("is_weekend"),
        )
    )


def build_dim_payment_method(transactions: DataFrame) -> DataFrame:
    """load_warehouse.py:180-196: distinct payment methods."""
    return _surrogate(
        transactions.select(
            F.col("payment_method").alias("payment_method_name")
        ).distinct(),
        "payment_method_key",
        "payment_method_name",
    ).select("payment_method_key", "payment_method_name")


def build_fact_sales(
    items: DataFrame,
    transactions: DataFrame,
    products: DataFrame,
    dim_customers: DataFrame,
    dim_products: DataFrame,
    dim_payment_method: DataFrame,
    dim_date: DataFrame,
) -> DataFrame:
    """The 6-way fact join (load_warehouse.py:208-227, J1).

    items⋈transactions shuffles on transaction_id; every dimension join is
    an explicit broadcast (dims are small by construction).  is_current
    guards reproduce the compound join conditions (J1).
    """
    f = (
        items.alias("ti")
        .join(transactions.alias("t"), "transaction_id")
        .join(F.broadcast(products.alias("p")), "product_id")
        .join(
            F.broadcast(dim_customers.alias("dc")),
            (F.col("t.customer_id") == F.col("dc.customer_id"))
            & F.col("dc.is_current"),
        )
        .join(
            F.broadcast(dim_products.alias("dp")),
            (F.col("ti.product_id") == F.col("dp.product_id"))
            & F.col("dp.is_current"),
        )
        .join(
            F.broadcast(dim_payment_method.alias("pm")),
            F.col("t.payment_method") == F.col("pm.payment_method_name"),
        )
        .join(
            F.broadcast(dim_date.alias("dd")),
            F.col("t.transaction_date") == F.col("dd.full_date"),
        )
    )
    line_total = F.col("ti.line_total")
    out = f.select(
        F.col("ti.transaction_id").alias("transaction_id"),
        F.col("dc.customer_key").alias("customer_key"),
        F.col("dp.product_key").alias("product_key"),
        F.col("dd.date_key").alias("date_key"),
        F.col("pm.payment_method_key").alias("payment_method_key"),
        F.col("ti.quantity").alias("quantity"),
        F.col("ti.unit_price").alias("unit_price"),
        F.col("ti.discount_percentage").alias("discount_percentage"),
        F.round(
            F.col("ti.unit_price") * F.col("ti.quantity") - line_total, 2
        ).cast("decimal(12,2)").alias("discount_amount"),
        line_total.alias("line_total"),
        # profit = line_total - quantity*cost (load_warehouse.py:217-219)
        F.round(line_total - F.col("ti.quantity") * F.col("p.cost"), 2)
        .cast("decimal(12,2)")
        .alias("profit"),
        F.col("ti.item_id").alias("_item_id"),
    )
    return dense_sequence(out, "sales_key", "_item_id").drop("_item_id").select(
        "sales_key", "transaction_id", "customer_key", "product_key",
        "date_key", "payment_method_key", "quantity", "unit_price",
        "discount_percentage", "discount_amount", "line_total", "profit",
    )


# ------------------------------------------------------- aggregate tables
# Declared in the reference DDL (create_warehouse_schema.sql:100-128) but
# never loaded by it (SURVEY.md §1.1) — implemented here as real gold-layer
# aggregates since their schemas define the intended semantics.

def build_agg_daily_sales(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    return (
        fact.join(F.broadcast(dim_date), "date_key")
        .groupBy("date_key", "full_date")
        .agg(
            F.sum("line_total").cast("decimal(14,2)").alias("total_revenue"),
            F.countDistinct("transaction_id").alias("total_transactions"),
            F.sum("quantity").alias("total_units"),
            F.countDistinct("customer_key").alias("unique_customers"),
            F.sum("profit").cast("decimal(14,2)").alias("total_profit"),
        )
    )


def build_agg_product_performance(fact: DataFrame, dim_products: DataFrame) -> DataFrame:
    return (
        fact.join(F.broadcast(dim_products), "product_key")
        .groupBy("product_key", "product_id", "product_name", "category")
        .agg(
            F.sum("line_total").cast("decimal(14,2)").alias("total_revenue"),
            F.sum("quantity").alias("units_sold"),
            F.sum("profit").cast("decimal(14,2)").alias("total_profit"),
            F.countDistinct("transaction_id").alias("n_transactions"),
        )
    )


def build_agg_customer_metrics(fact: DataFrame, dim_customers: DataFrame) -> DataFrame:
    return (
        fact.join(F.broadcast(dim_customers), "customer_key")
        .groupBy("customer_key", "customer_id", "full_name", "state")
        .agg(
            F.sum("line_total").cast("decimal(14,2)").alias("total_spent"),
            F.countDistinct("transaction_id").alias("transaction_count"),
            F.avg("line_total").cast("decimal(12,2)").alias("avg_item_value"),
            F.max("date_key").alias("last_purchase_date_key"),
        )
    )


def build_warehouse(
    customers: DataFrame,
    products: DataFrame,
    transactions: DataFrame,
    items: DataFrame,
    run_date: str = RUN_DATE,
) -> dict[str, DataFrame]:
    dim_c = build_dim_customers(customers, run_date)
    dim_p = build_dim_products(products, run_date)
    dim_d = build_dim_date(transactions)
    dim_pm = build_dim_payment_method(transactions)
    fact = build_fact_sales(items, transactions, products, dim_c, dim_p, dim_pm, dim_d)
    return {
        "dim_customers": dim_c,
        "dim_products": dim_p,
        "dim_date": dim_d,
        "dim_payment_method": dim_pm,
        "fact_sales": fact,
        "agg_daily_sales": build_agg_daily_sales(fact, dim_d),
        "agg_product_performance": build_agg_product_performance(fact, dim_p),
        "agg_customer_metrics": build_agg_customer_metrics(fact, dim_c),
    }
