"""Behavioral / time-series analytics gates (q30-q34) — rolling range-frame
windows, cohort retention, sequential funnels, arbitrary grouping sets, and
INTERSECT.  The reference's analytics stop at plain GROUP BY + one
percent-of-total window (SURVEY.md §2.4-2.5, `sql/queries/
analytical_queries.sql`); these add the event-behavior query family every
warehouse on top of an `events` stream needs.  Exact DuckDB oracle for
each.

Scale notes per gate live in the docstrings; the shared principle: every
window/join here runs over a PRE-AGGREGATED relation (day / week / user
grain), so the expensive shuffle happens once on the raw table with
map-side partial aggregation, and the windowed refinement touches only
the small derived relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exprs import dsum, money_sum, quant, r2, safe_pct

FUNNEL_STAGES = ("view", "click", "purchase")
COHORT_GRAIN = "week"
ROLLING_DAYS = 7


def q30_rolling_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling revenue: a RANGE frame over *calendar days* — unlike a
    ROWS frame, missing days correctly shrink the window instead of
    silently widening it to 7 data-carrying rows.

    Spark's rangeBetween needs a numeric ordering, so the frame is keyed
    on days-since-epoch; the sum itself is decimal (order-independent).
    The window is unpartitioned but runs over the one-row-per-day
    aggregate, not the fact table — at 100 TB the daily rollup is still
    only ~365 rows/year, so the single-partition sort is trivial; the
    heavy lifting (groupBy day) is a partial-agg shuffle on the raw
    table."""
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("rev"),
    )
    daynum = F.datediff(F.to_date("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.orderBy(daynum)
        .rangeBetween(-(ROLLING_DAYS - 1), 0)
    )
    return (
        daily.select(
            "day",
            "n_orders",
            r2(F.col("rev")).alias("day_revenue"),
            F.sum("n_orders").over(w).alias("rolling_orders"),
            r2(F.sum("rev").over(w)).alias("rolling_revenue"),
        )
        .orderBy("day")
    )


def q31_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week, then
    distinct-active counts per (cohort_week, week_offset) with retention
    as a percent of cohort size.

    Two aggregations share the user_id shuffle key (first-seen, then
    activity joined back to cohort), so AQE reuses the partitioning; the
    distinct-count runs per (cohort, offset) cell.  All arithmetic on
    week boundaries is integer (datediff/7 is exact), so no float
    drift."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc(COHORT_GRAIN, F.min("ts")).alias("cohort_week")
    )
    act = ev.join(cohort, "user_id").select(
        "user_id",
        "cohort_week",
        F.date_trunc(COHORT_GRAIN, F.col("ts")).alias("act_week"),
    )
    offset = (
        F.datediff(F.to_date("act_week"), F.to_date("cohort_week")) / 7
    ).cast("int")
    cells = act.groupBy("cohort_week", offset.alias("week_offset")).agg(
        F.countDistinct("user_id").alias("n_active")
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return (
        cells.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            "n_active",
            safe_pct(F.col("n_active"), F.col("cohort_size")).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


def q32_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view → click → purchase: each
    stage counts users whose first stage-N event happened AFTER their
    first stage-(N-1) event — sequence matters, not mere co-occurrence
    (that weaker set-overlap semantics is q34's INTERSECT).

    Each stage is a groupBy(user) min-timestamp joined to the previous
    stage's result — three shuffles on the same user_id key over
    ever-shrinking relations.  The stage outputs are single-row
    aggregates stacked and chained with lag() for step conversion."""
    ev = table(spark, sf_dir, "events")
    view, click, purchase = FUNNEL_STAGES

    v = (
        ev.filter(F.col("event_type") == view)
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == click)
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == purchase)
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = (
        ev.agg(F.countDistinct("user_id").alias("n_all"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_view")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    stages = counts.select(
        F.expr(
            "stack(4, '1_all_users', n_all, '2_first_view', n_view, "
            "'3_click_after_view', n_click, "
            "'4_purchase_after_click', n_purchase) AS (stage, n_users)"
        )
    )
    w = Window.orderBy("stage")
    return stages.select(
        "stage",
        "n_users",
        safe_pct(F.col("n_users"), F.lag("n_users").over(w)).alias(
            "step_conversion_pct"
        ),
    ).orderBy("stage")


def q33_returnflag_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS ((returnflag), (linestatus)): two
    independent one-dimensional rollups in ONE scan of the fact table —
    the pattern dashboards use to fill several breakdown widgets without
    re-reading the source.  Completes the grouping-set family next to
    q17's ROLLUP and q24's CUBE; unlike CUBE it computes only the sets
    asked for, which at 100 TB is the difference between 2 and 4
    aggregation passes."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(rev).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_items",
            "revenue",
        )
        .orderBy("returnflag", "linestatus")
    )


def q34_click_purchase_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users who both clicked and purchased (any order — the
    set-overlap counterpart of q32's sequenced funnel).  Spark plans
    INTERSECT as a distinct + left-semi join pair; with both sides
    pre-distincted on the same key the shuffle is shared.  Completes the
    set-op family: UNION ALL (q11/q13), EXCEPT (t13), INTERSECT
    (here)."""
    ev = table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers).orderBy("user_id")


def t75_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences — the
    sequence-data-prep primitive (next-event modeling corpora, funnel
    discovery, session-shape features): one lag() per user ordered by
    (ts, event_id), then (prev, next) counts and row-normalized
    transition probabilities.

    Scale shape: ONE shuffle — the window partitions by user_id (high
    cardinality, so every executor gets work and no partition exceeds
    a user's own history); the (prev, next) aggregate is map-side
    combinable down to |types|² rows, and the per-prev normalizer is a
    window over that tiny matrix, not the raw events.  The probability
    is one cast-to-double then one IEEE division (cnt and total are
    exact BIGINTs), so the oracle replays it bit-for-bit."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNotNull()
    )
    trans = seq.groupBy("prev", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    tw = Window.partitionBy("prev")
    return (
        trans.withColumn("total", F.sum("n_trans").over(tw))
        .select(
            F.col("prev").alias("prev_type"),
            F.col("event_type").alias("next_type"),
            "n_trans",
            quant(
                F.col("n_trans").cast("double") / F.col("total"), 6
            ).alias("p_trans"),
        )
        .orderBy("prev_type", "next_type")
    )
