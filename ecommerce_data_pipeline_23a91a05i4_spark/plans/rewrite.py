"""Aggregate-table substitution — the one candidate custom-optimizer
piece SURVEY.md §4 identifies (automatic view matching, "(a)").

The reference DECLARES three materialized aggregates
(`sql/ddl/create_warehouse_schema.sql:100-128`) precisely so dashboards
can skip the fact table, but never wires any query to them; our
warehouse builds them (warehouse.build_agg_*).  Catalyst has no
automatic aggregate/view matching, and writing a catalyst rule for it
would be the wrong layer anyway (matching is semantic, fragile, and
needs freshness guarantees); the engineering answer is the explicit
rewrite layer every lakehouse uses: queries that are derivable from a
pre-aggregate get a hand-verified substitute here, and the TESTS prove
result-equality against the fact-table original — the same contract an
optimizer rule would have to prove, enforced at test time instead of
plan time.

Substitution is sound because each agg table's grain is a superset of
the query's grouping: top-products (product grain) folds from
agg_product_performance (product grain + category), daily revenue folds
from agg_daily_sales (day grain).  COUNT(DISTINCT x) does NOT fold
across grains — q2's unique_customers per month cannot come from daily
unique_customers (customers repeat across days); that query keeps the
fact table, and the docstring-level rule is the real content of this
module: *additive measures fold, distinct counts fold only along their
own dimension.*
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q1_top_products_from_agg(spark: SparkSession) -> DataFrame:
    """Top-10 products by revenue answered from agg_product_performance:
    no fact scan, no join — the agg already carries product grain with
    additive revenue/units.  avg_price = revenue/units is NOT derivable
    (q1 averages unit_price over line items), so this variant reports
    the derivable measures; dashboards wanting avg unit price keep q1."""
    agg = spark.table("agg_product_performance")
    return (
        agg.groupBy("product_name", "category")
        .agg(
            F.sum("total_revenue").alias("total_revenue"),
            F.sum("units_sold").alias("units_sold"),
        )
        .orderBy(F.desc("total_revenue"), "product_name")
        .limit(10)
    )


def q1_top_products_from_fact(spark: SparkSession) -> DataFrame:
    """The fact-table original, measures matched to the agg variant —
    the equality fixture for substitution soundness."""
    f = spark.table("fact_sales")
    p = spark.table("dim_products")
    return (
        f.join(F.broadcast(p), "product_key")
        .groupBy("product_name", "category")
        .agg(
            F.sum("line_total").alias("total_revenue"),
            F.sum("quantity").alias("units_sold"),
        )
        .orderBy(F.desc("total_revenue"), "product_name")
        .limit(10)
    )


def daily_revenue_from_agg(spark: SparkSession) -> DataFrame:
    """Revenue/transactions per day from agg_daily_sales — the dashboard
    time series with zero fact I/O."""
    return spark.table("agg_daily_sales").select(
        "full_date",
        "total_revenue",
        "total_transactions",
        "total_units",
    ).orderBy("full_date")


def daily_revenue_from_fact(spark: SparkSession) -> DataFrame:
    f = spark.table("fact_sales")
    d = spark.table("dim_date")
    return (
        f.join(F.broadcast(d), "date_key")
        .groupBy("full_date")
        .agg(
            F.sum("line_total").cast("decimal(14,2)").alias("total_revenue"),
            F.countDistinct("transaction_id").alias("total_transactions"),
            F.sum("quantity").alias("total_units"),
        )
        .orderBy("full_date")
    )
