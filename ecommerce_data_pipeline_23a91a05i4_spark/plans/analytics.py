"""The reference's 10-query analytics suite, re-expressed on the driver's
TPC-H-ish star schema (lineitem/orders = fact side; part/customer/nation/
region = dimensions).

Each query keeps the *operator shape* of its reference counterpart
(reference: /root/reference/sql/queries/analytical_queries.sql):

    q1  top-K by revenue            (A1 hash agg, O1 top-k, J2 dim join)
    q2  monthly trend               (A1, A2 count-distinct, F6 concat/lpad)
    q3  spend segmentation          (A4 agg-of-agg, P10 CASE buckets, CTE)
    q4  category performance        (A1, A8 NULLIF-guarded division)
    q5  distribution w/ pct-of-total(W1 window-over-aggregate)
    q6  geography                   (J1 multi-way join, A2)
    q7  lifetime value              (A1 per-entity, F13 date arithmetic)
    q8  profitability               (A1, A8)
    q9  day-of-week pattern         (A4 two-level agg, F11 day names)
    q10 discount impact             (P10 buckets on derived expr, F18)

Determinism/oracle-parity conventions (the driver hash-compares these
against DuckDB — see functions/exprs.py for why):
- money aggregates use exact decimal accumulation, quantized to 2dp;
  percentages to 4dp; never engine-native ROUND on doubles;
- top-K orderings sort on the quantized measure with a unique tie-break key
  so both engines select the same rows;
- date arithmetic is anchored at a fixed date, never CURRENT_DATE
  (the reference's CURRENT_DATE usage is nondeterministic; SURVEY.md F12).

Scale notes: lineitem⋈orders is the only fact-fact join; it shuffles on the
join key and AQE handles skew.  All other joins are dimension joins that
Spark resolves as broadcast hash joins under the configured threshold (the
tiny region/nation are forced with ``broadcast()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exprs import DEC6, dsum, mean2, money_sum, r2, r4, safe_pct

# Fixed "as of" anchor for date arithmetic (data's max order date is 2001-08).
ANCHOR_DATE = "2002-01-01"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _profit() -> F.Column:
    # Synthetic unit-cost model: 70% of the part's retail price.  The
    # reference computes profit as line_total - quantity*cost
    # (load_warehouse.py:217-219); the testdata has no cost column, so the
    # cost model is fixed and mirrored exactly in the oracle SQL.
    return _rev() - F.col("l_quantity") * F.col("p_retailprice") * 0.7


def q1_top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 products by revenue (ref Q1, analytical_queries.sql:4-15).

    Plan shape (optimization r12, guide §2.3 "shuffle fewer bytes"):
    the fact rows are aggregated on the 8-byte ``l_partkey`` alone —
    no join, no strings in the hot hash-aggregate — then the ~|parts|
    partials broadcast-join ``part`` to attach name/brand and re-sum
    per (name, brand).  Decimal partials re-add exactly (order-
    independent), so totals are bit-identical to the single-level
    aggregate; integer-valued double sums (quantity, counts) are exact
    under 2^53.  The inner join semantics are preserved by the
    post-agg join (a partkey missing from ``part`` drops there, having
    never contributed)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        dsum(_rev()).alias("_rev_dec"),
        F.sum("l_quantity").alias("_units"),
        dsum(F.col("l_extendedprice")).alias("_ext_dec"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        per_part.join(part, per_part.l_partkey == part.p_partkey)
        .groupBy("p_name", "p_brand")
        .agg(
            r2(F.sum("_rev_dec")).alias("total_revenue"),
            F.sum("_units").alias("units_sold"),
            r2(
                F.sum("_ext_dec").cast("double") / F.sum("_n")
            ).alias("avg_price"),
        )
        .select(
            F.col("p_name").alias("product_name"),
            F.col("p_brand").alias("brand"),
            "total_revenue",
            "units_sold",
            "avg_price",
        )
        .orderBy(F.desc("total_revenue"), "product_name", "brand")
        .limit(10)
    )


def q2_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly sales trend (ref Q2, analytical_queries.sql:20-30)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    # Two-level aggregate (optimization r12, guide §2.3 "aggregate
    # before you shuffle"): the single-level form computed TWO
    # count-distincts over the joined fact rows — an Expand that
    # tripled the aggregated row stream.  Orders are unique by
    # o_orderkey, so each (year, month, orderkey) level-1 group is one
    # order (its o_custkey constant — min() reads it deterministically);
    # level 2 then needs one distinct on |orders|-cardinality rows, not
    # three streams of |lineitem|.  Decimal partials re-add exactly, so
    # every output value is bit-identical to the single-level plan.
    per_order = j.groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.col("l_orderkey"),
    ).agg(
        dsum(_rev()).alias("_rev_dec"),
        F.count(F.lit(1)).alias("_n_items"),
        F.min("o_custkey").alias("_custkey"),
    )
    return (
        per_order.groupBy("o_year", "o_month")
        .agg(
            r2(F.sum("_rev_dec")).alias("total_revenue"),
            F.count(F.lit(1)).alias("total_orders"),
            r2(
                F.sum("_rev_dec").cast("double") / F.sum("_n_items")
            ).alias("avg_item_value"),
            F.countDistinct("_custkey").alias("unique_customers"),
        )
        .select(
            F.concat_ws(
                "-",
                F.col("o_year").cast("string"),
                F.lpad(F.col("o_month").cast("string"), 2, "0"),
            ).alias("year_month"),
            "total_revenue",
            "total_orders",
            "avg_item_value",
            "unique_customers",
        )
        .orderBy("year_month")
    )


def q3_customer_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segmentation by spend (ref Q3, analytical_queries.sql:35-54).

    Two-level aggregate: per-customer totals (CTE in the reference), then
    CASE-bucketed rollup.  Buckets are scaled to the TPC-H-ish spend range.
    """
    orders = table(spark, sf_dir, "orders")
    totals = orders.groupBy("o_custkey").agg(
        money_sum(F.col("o_totalprice")).alias("total_spent")
    )
    seg = (
        F.when(F.col("total_spent") < 50000, "$0-$50K")
        .when(F.col("total_spent") < 150000, "$50K-$150K")
        .when(F.col("total_spent") < 300000, "$150K-$300K")
        .otherwise("$300K+")
    )
    return (
        totals.select(seg.alias("spending_segment"), "total_spent")
        .groupBy("spending_segment")
        .agg(
            F.count("*").alias("customer_count"),
            money_sum(F.col("total_spent")).alias("total_revenue"),
            mean2(F.col("total_spent"), F.count(F.lit(1))).alias(
                "avg_customer_spend"
            ),
        )
        .orderBy(F.desc("customer_count"), "spending_segment")
    )


def q4_category_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category performance w/ profit margin (ref Q4, :59-69)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    # Narrow-key aggregation (optimization r12, guide §2.3): the join
    # stays BEFORE the aggregate (_profit reads p_retailprice per fact
    # row, so per-row decimals are unchanged), but level 1 groups on
    # the 8-byte p_partkey instead of the p_type string; the ~|parts|
    # decimal partials then re-aggregate per category exactly.
    j = li.join(part, li.l_partkey == part.p_partkey)
    per_part = j.groupBy("p_partkey").agg(
        dsum(_rev()).alias("_rev_dec"),
        dsum(_profit()).alias("_profit_dec"),
        F.sum("l_quantity").alias("_units"),
    )
    return (
        per_part.join(
            part.select("p_partkey", "p_type"), "p_partkey"
        )
        .groupBy(F.col("p_type").alias("category"))
        .agg(
            r2(F.sum("_rev_dec")).alias("total_revenue"),
            r2(F.sum("_profit_dec")).alias("total_profit"),
            safe_pct(
                F.sum("_profit_dec"), F.sum("_rev_dec")
            ).alias("profit_margin_pct"),
            F.sum("_units").alias("units_sold"),
        )
        .orderBy(F.desc("total_revenue"))
    )


def q5_payment_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution with percent-of-total window (ref Q5, :74-85).

    The only window function in the reference (W1): an aggregate nested in a
    whole-relation window.  Order-priority plays the payment-method role.
    """
    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy(F.col("o_orderpriority").alias("order_priority")).agg(
        F.count("*").alias("order_count"),
        dsum(F.col("o_totalprice")).alias("_rev_dec"),
    )
    w = Window.partitionBy()  # whole relation; post-agg rows are tiny
    return agg.select(
        "order_priority",
        "order_count",
        r2(F.col("_rev_dec")).alias("total_revenue"),
        r4(
            F.col("order_count") * 100.0 / F.sum("order_count").over(w)
        ).alias("pct_of_orders"),
        safe_pct(F.col("_rev_dec"), F.sum("_rev_dec").over(w)).alias(
            "pct_of_revenue"
        ),
    ).orderBy("order_priority")


def q6_geo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geographic revenue (ref Q6, :90-99) via the 4-way star join (J1)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    # Decide with small rows (optimization r12, guide §8 / §2.3): the
    # fact rows aggregate on (c_nationkey, c_custkey) — two longs — so
    # the countDistinct becomes a count over level-1 groups (no Expand
    # over fact rows) and the nation/region STRING joins move below the
    # aggregate, touching ~|customers| partials instead of every
    # lineitem.  Decimal partials re-add exactly; every nationkey has
    # exactly one nation/region row (broadcast inner joins preserved).
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    per_cust = j.groupBy("c_nationkey", "c_custkey").agg(
        dsum(_rev()).alias("_rev_dec")
    )
    per_nation = per_cust.groupBy("c_nationkey").agg(
        F.sum("_rev_dec").alias("_rev_dec"),
        F.count(F.lit(1)).alias("total_customers"),
    )
    return (
        per_nation.join(
            F.broadcast(nation),
            per_nation.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            r2(F.col("_rev_dec")).alias("total_revenue"),
            "total_customers",
            r2(
                F.col("_rev_dec").cast("double") / F.col("total_customers")
            ).alias("avg_revenue_per_customer"),
        )
        .orderBy(F.desc("total_revenue"), "nation")
    )


def q7_customer_lifetime_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime value (ref Q7, :104-115).

    The reference uses CURRENT_DATE - registration_date; here recency is
    anchored at ANCHOR_DATE for determinism (SURVEY.md F12 pothole).
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        money_sum(F.col("o_totalprice")).alias("total_spent"),
        F.count("*").alias("order_count"),
        mean2(F.col("o_totalprice"), F.count(F.lit(1))).alias("avg_order_value"),
        F.datediff(F.lit(ANCHOR_DATE).cast("date"), F.max("o_orderdate"))
        .cast("long")
        .alias("days_since_last_order"),
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            "total_spent",
            "order_count",
            "avg_order_value",
            "days_since_last_order",
        )
        .orderBy(F.desc("total_spent"), "customer_id")
    )


def q8_product_profitability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product profitability (ref Q8, :120-131)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    # Narrow-key aggregation (optimization r12, guide §2.3): p_partkey
    # is unique in part, so p_name/p_brand are constant per group —
    # aggregate on the 8-byte key alone (the join stays before the
    # aggregate: _profit reads p_retailprice per fact row) and attach
    # the two strings afterwards with a broadcast join against part.
    # The hot hash-aggregate and its exchange carry no strings.
    j = li.join(part, li.l_partkey == part.p_partkey)
    agg = j.groupBy("p_partkey").agg(
        money_sum(_profit()).alias("total_profit"),
        safe_pct(dsum(_profit()), dsum(_rev())).alias("profit_margin"),
        money_sum(_rev()).alias("revenue"),
        F.sum("l_quantity").alias("units_sold"),
    )
    return (
        agg.join(
            F.broadcast(part.select("p_partkey", "p_name", "p_brand")),
            "p_partkey",
        )
        .select(
            F.col("p_partkey").alias("product_id"),
            F.col("p_name").alias("product_name"),
            F.col("p_brand").alias("brand"),
            "total_profit",
            "profit_margin",
            "revenue",
            "units_sold",
        )
        .orderBy(F.desc("total_profit"), "product_id")
    )


def q9_dow_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week sales pattern (ref Q9, :136-153): agg-of-agg (A4)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    daily = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.date_format("o_orderdate", "EEEE").alias("day_name"),
            F.to_date("o_orderdate").alias("order_date"),
        )
        .agg(
            dsum(_rev()).alias("daily_revenue"),
            F.countDistinct("l_orderkey").alias("daily_orders"),
        )
    )
    n_days = F.count(F.lit(1))
    return (
        daily.groupBy("day_name")
        .agg(
            r2(F.sum("daily_revenue").cast("double") / n_days).alias(
                "avg_daily_revenue"
            ),
            r2(F.sum("daily_orders").cast("double") / n_days).alias(
                "avg_daily_orders"
            ),
            r2(F.sum("daily_revenue")).alias("total_revenue"),
        )
        .orderBy(F.desc("total_revenue"), "day_name")
    )


def q10_discount_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount impact analysis (ref Q10, :159-183): CASE buckets on a
    derived discount percentage, zero-guarded (F18)."""
    li = table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_discount") == 0, "0%")
        .when(F.col("l_discount") <= 0.05, "1-5%")
        .otherwise("6-10%")
    )
    return (
        li.select(
            bucket.alias("discount_range"),
            "l_discount",
            "l_quantity",
            _rev().alias("net_revenue"),
        )
        .groupBy("discount_range")
        .agg(
            r4(
                dsum(F.col("l_discount") * 100, DEC6).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_discount_pct"),
            F.sum("l_quantity").alias("total_quantity_sold"),
            money_sum(F.col("net_revenue")).alias("total_revenue"),
            mean2(F.col("net_revenue"), F.count(F.lit(1))).alias("avg_line_total"),
        )
        .orderBy(F.desc("total_revenue"), "discount_range")
    )
