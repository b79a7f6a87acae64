"""Advanced relational gates beyond the reference's query surface —
window navigation, cube, per-group top-k, full outer join, date-spine
gap fill, decorrelated subqueries, and exact distributed moment
statistics.  The reference (SURVEY.md §2.5-2.6) uses exactly one window
function and no cube/full-outer/spine patterns; these close the gap
between its AVG-only analytics and what a warehouse query surface
actually needs, each with an exact DuckDB oracle.

Determinism discipline: every aggregate goes through functions/exprs.py
(decimal accumulation + floor-quantization) so hash comparison is exact;
scalar double expressions are written with the identical operation order
in both engines (IEEE arithmetic is deterministic once aggregation order
is fixed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exprs import dsum, mean2, money_sum, quant, r2, safe_pct


def q23_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: lag() navigation over the monthly
    aggregate.  The window is unpartitioned by design — it runs over the
    ~24-row POST-aggregate relation, not the fact table, so the
    single-partition sort is trivial at any input scale."""
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("revenue"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        monthly.select(
            "month",
            "n_orders",
            "revenue",
            prev.alias("prev_revenue"),
            safe_pct(F.col("revenue") - prev, prev).alias("growth_pct"),
        )
        .orderBy("month")
    )


def q24_brand_type_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (brand, type): all four grouping-set combinations in one
    pass — the multi-dimensional completion of q17's ROLLUP.  Partial
    aggregation still applies per grouping set; at scale, prefer
    enumerating only the grouping sets dashboards actually read."""
    part = table(spark, sf_dir, "part")
    return (
        part.cube("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            money_sum(F.col("p_retailprice")).alias("total_price"),
            mean2(F.col("p_retailprice"), F.count(F.lit(1))).alias("avg_price"),
        )
        .select(
            F.coalesce(F.col("p_brand"), F.lit("ALL")).alias("brand"),
            F.coalesce(F.col("p_type"), F.lit("ALL")).alias("part_type"),
            "n_parts",
            "total_price",
            "avg_price",
        )
        .orderBy("brand", "part_type")
    )


def q25_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand: ranked window + filter, the
    per-group top-k every catalog/leaderboard query needs.  Unlike global
    top-k (q1's TakeOrderedAndProject), this shuffles once on the
    partition key and sorts within groups only; ties broken by partkey
    for determinism."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.col("p_partkey")
    )
    return (
        part.select(
            F.col("p_brand").alias("brand"),
            F.row_number().over(w).alias("brand_rank"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            r2(F.col("p_retailprice")).alias("retail_price"),
        )
        .filter(F.col("brand_rank") <= 3)
        .orderBy("brand", "brand_rank")
    )


def q26_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two independently-aggregated daily series
    (orders vs events) — the calendar-alignment pattern for sources with
    non-overlapping activity windows.  Both sides pre-aggregate to one
    row per day BEFORE the join, so the full-outer shuffle moves
    day-grained data regardless of input scale."""
    orders = table(spark, sf_dir, "orders")
    events = table(spark, sf_dir, "events")
    od = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("order_value"),
    )
    ed = events.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        r2(dsum(F.col("value"))).alias("event_value"),
    )
    return (
        od.join(ed, "day", "full_outer")
        .select(
            "day",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("order_value"), F.lit(0.0)).alias("order_value"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("event_value"), F.lit(0.0)).alias("event_value"),
        )
        .orderBy("day")
    )


def q27_order_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily order counts rolled up per month: generate the
    full date spine with sequence()+explode (no calendar table needed),
    left-join actual daily counts, and report coverage including
    zero-order days — the days a naive GROUP BY date silently drops.
    The spine is built from a 1-row bounds aggregate, so its explode is
    driver-light and the join is a broadcast."""
    orders = table(spark, sf_dir, "orders")
    day = F.to_date(F.col("o_orderdate"))
    bounds = orders.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day")
    )
    daily = orders.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    filled = spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders")
    )
    return (
        filled.groupBy(F.trunc("day", "month").cast("timestamp").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.when(F.col("n_orders") > 0, 1).otherwise(0)).alias(
                "n_active_days"
            ),
            F.sum(F.when(F.col("n_orders") == 0, 1).otherwise(0)).alias(
                "n_zero_days"
            ),
            F.sum("n_orders").alias("total_orders"),
        )
        .orderBy("month")
    )


def q28_nation_balance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery semantics (customers whose balance exceeds 1.5x
    their nation's average), decorrelated into an aggregate + join — the
    rewrite every optimizer applies, made explicit.  The comparison is
    done in exact integer/decimal cross-multiplied form
    (2·bal·n > 3·sum  ⇔  bal > 1.5·avg) so no engine ever divides:
    threshold comparisons on computed doubles are where cross-engine
    boundary flips live."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    per_nation = cust.groupBy("c_nationkey").agg(
        dsum(F.col("c_acctbal")).alias("sum_bal"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    bal = F.col("c_acctbal").cast("decimal(18,4)")
    return (
        cust.join(F.broadcast(per_nation), "c_nationkey")
        .filter(bal * 2 * F.col("n_cust") > F.col("sum_bal") * 3)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("custkey"),
            r2(F.col("c_acctbal")).alias("acctbal"),
        )
        .orderBy("nation", "custkey")
    )


def q29_lineitem_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed second-moment statistics per return flag:
    stddev and quantity-price correlation computed from DECIMAL
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) instead of
    engine-native stddev()/corr().

    Native corr/stddev accumulate doubles in partition order — two
    engines (or two cluster sizes!) can disagree in the last ulp.
    Decimal sums are order-independent and exact; the final scalar
    formula runs in IEEE doubles with an identical operation tree on
    both sides, so the result is bit-stable.  This is also the mergeable
    form: partial (n,Σ...) tuples combine associatively, which is what
    makes the stat computable map-side at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"),
        dsum(y, "decimal(28,4)").alias("sy"),
        dsum(x * y, "decimal(28,4)").alias("sxy"),
        dsum(x * x, "decimal(28,4)").alias("sxx"),
        dsum(y * y, "decimal(28,4)").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    std_qty = F.sqrt((n * sxx - sx * sx) / (n * (n - 1)))
    avg_qty = quant(sx / n, 6)
    return agg.select(
        F.col("l_returnflag").alias("returnflag"),
        "n",
        avg_qty.alias("avg_qty"),
        quant(std_qty, 6).alias("stddev_qty"),
        quant(corr, 6).alias("corr_qty_price"),
    ).orderBy("returnflag")


# q35's association-rule knobs — gate-pinned so the oracle replays them.
BASKET_CAP = 16    # deterministic per-order item cap (hot-basket guard)
MIN_PAIR_COUNT = 2  # noise floor for emitted pairs


def q35_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with association-rule metrics —
    support, confidence(a→b), and lift per frequently-co-bought part
    pair.  The classic retail operator the reference's analytics stop
    short of, and the shape that generalizes to token/domain
    co-occurrence in corpus work.

    Scale shape: the pair stage is a self-equi-join on l_orderkey, so
    its cost is Σ basket_size² — bounded by the deterministic
    BASKET_CAP (items ranked by part key within the order; degenerate
    mega-baskets contribute at most CAP² pairs instead of blowing up
    quadratically), never a cross join.  Counts are exact BIGINTs
    aggregated map-side; each metric is integer arithmetic then ONE
    cast-to-double IEEE division (quantized), so the oracle replays
    every value bit-for-bit.  n_orders is one scalar count action."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_partkey")
    b = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BASKET_CAP)
        .drop("rn")
        .localCheckpoint(eager=True)  # reused by pairs + both margins
    )
    n_orders = b.select("l_orderkey").distinct().count()
    item = b.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("c.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= MIN_PAIR_COUNT)
    )
    na = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    nb = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(na, "part_a")
        .join(nb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_pair",
            quant(
                F.col("n_pair").cast("double") / F.lit(float(n_orders)), 6
            ).alias("support"),
            quant(
                F.col("n_pair").cast("double") / F.col("n_a"), 6
            ).alias("confidence"),
            quant(
                (F.col("n_pair") * F.lit(n_orders)).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_pair"), "part_a", "part_b")
    )
