"""The reference's 10 analytical queries, verbatim-ish in Spark SQL over
the warehouse views (reference: sql/queries/analytical_queries.sql).

The runner keeps the reference's (naive but faithful) execution contract:
the SQL text is split on ';' (generate_analytics.py:40-43 — no semicolons
inside string literals in this corpus), each statement runs via
spark.sql(), results land as single-file CSVs plus a per-query metrics
summary (S6/S8).

Postgres→Spark dialect deltas (SURVEY.md §4): ::TEXT casts → CAST AS
STRING; CURRENT_DATE - date → datediff against the injected run date (F12
determinism); TO_CHAR month/day names were already materialized unpadded
into dim_date by warehouse.py.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import SparkSession

RUN_DATE = "2024-01-01"

ANALYTICS_SQL = """
-- Query 1: Top 10 Products by Revenue
SELECT
    p.product_name,
    p.category,
    SUM(f.line_total) AS total_revenue,
    SUM(f.quantity) AS units_sold,
    AVG(f.unit_price) AS avg_price
FROM fact_sales f
JOIN dim_products p ON f.product_key = p.product_key
GROUP BY p.product_name, p.category
ORDER BY total_revenue DESC
LIMIT 10;

-- Query 2: Monthly Sales Trend
SELECT
    CAST(d.year AS STRING) || '-' || LPAD(CAST(d.month AS STRING), 2, '0') AS year_month,
    SUM(f.line_total) AS total_revenue,
    COUNT(DISTINCT f.transaction_id) AS total_transactions,
    AVG(f.line_total) AS average_order_value,
    COUNT(DISTINCT f.customer_key) AS unique_customers
FROM fact_sales f
JOIN dim_date d ON f.date_key = d.date_key
GROUP BY d.year, d.month
ORDER BY d.year, d.month;

-- Query 3: Customer Segmentation by Spend
WITH customer_totals AS (
    SELECT customer_key, SUM(line_total) AS total_spent
    FROM fact_sales
    GROUP BY customer_key
)
SELECT
    CASE
        WHEN total_spent < 1000 THEN '$0-$1,000'
        WHEN total_spent < 5000 THEN '$1,000-$5,000'
        WHEN total_spent < 10000 THEN '$5,000-$10,000'
        ELSE '$10,000+'
    END AS spending_segment,
    COUNT(*) AS customer_count,
    SUM(total_spent) AS total_revenue,
    AVG(total_spent) AS avg_transaction_value
FROM customer_totals
GROUP BY 1
ORDER BY customer_count DESC;

-- Query 4: Category Performance
SELECT
    p.category,
    SUM(f.line_total) AS total_revenue,
    SUM(f.profit) AS total_profit,
    (SUM(f.profit) / NULLIF(SUM(f.line_total), 0)) * 100 AS profit_margin_pct,
    SUM(f.quantity) AS units_sold
FROM fact_sales f
JOIN dim_products p ON f.product_key = p.product_key
GROUP BY p.category
ORDER BY total_revenue DESC;

-- Query 5: Payment Method Distribution
SELECT
    pm.payment_method_name AS payment_method,
    COUNT(DISTINCT f.transaction_id) AS transaction_count,
    SUM(f.line_total) AS total_revenue,
    COUNT(DISTINCT f.transaction_id) * 100.0 /
        SUM(COUNT(DISTINCT f.transaction_id)) OVER () AS pct_of_transactions,
    SUM(f.line_total) * 100.0 /
        SUM(SUM(f.line_total)) OVER () AS pct_of_revenue
FROM fact_sales f
JOIN dim_payment_method pm ON f.payment_method_key = pm.payment_method_key
GROUP BY pm.payment_method_name;

-- Query 6: Geographic Revenue by State
SELECT
    c.state,
    SUM(f.line_total) AS total_revenue,
    COUNT(DISTINCT f.customer_key) AS total_customers,
    SUM(f.line_total) / COUNT(DISTINCT f.customer_key) AS avg_revenue_per_customer
FROM fact_sales f
JOIN dim_customers c ON f.customer_key = c.customer_key
GROUP BY c.state
ORDER BY total_revenue DESC;

-- Query 7: Customer Lifetime Value (CLV)
SELECT
    c.customer_id,
    c.full_name,
    SUM(f.line_total) AS total_spent,
    COUNT(DISTINCT f.transaction_id) AS transaction_count,
    DATEDIFF(DATE '{run_date}', c.registration_date) AS days_since_registration,
    AVG(f.line_total) AS avg_order_value
FROM fact_sales f
JOIN dim_customers c ON f.customer_key = c.customer_key
GROUP BY c.customer_id, c.full_name, c.registration_date
ORDER BY total_spent DESC;

-- Query 8: Product Profitability
SELECT
    p.product_name,
    p.category,
    SUM(f.profit) AS total_profit,
    (SUM(f.profit) / NULLIF(SUM(f.line_total), 0)) * 100 AS profit_margin,
    SUM(f.line_total) AS revenue,
    SUM(f.quantity) AS units_sold
FROM fact_sales f
JOIN dim_products p ON f.product_key = p.product_key
GROUP BY p.product_name, p.category
ORDER BY total_profit DESC;

-- Query 9: Day of Week Sales Pattern
SELECT
    day_name,
    AVG(daily_revenue) AS avg_daily_revenue,
    AVG(daily_transactions) AS avg_daily_transactions,
    SUM(daily_revenue) AS total_revenue
FROM (
    SELECT
        d.day_name AS day_name,
        d.date_key,
        SUM(f.line_total) AS daily_revenue,
        COUNT(DISTINCT f.transaction_id) AS daily_transactions
    FROM fact_sales f
    JOIN dim_date d ON f.date_key = d.date_key
    GROUP BY d.day_name, d.date_key
) t
GROUP BY day_name
ORDER BY total_revenue DESC;

-- Query 10: Discount Impact Analysis
SELECT
    CASE
        WHEN discount_pct = 0 THEN '0%'
        WHEN discount_pct <= 10 THEN '1-10%'
        WHEN discount_pct <= 25 THEN '11-25%'
        WHEN discount_pct <= 50 THEN '26-50%'
        ELSE '50%+'
    END AS discount_range,
    AVG(discount_pct) AS avg_discount_pct,
    SUM(quantity) AS total_quantity_sold,
    SUM(line_total) AS total_revenue,
    AVG(line_total) AS avg_line_total
FROM (
    SELECT
        quantity,
        unit_price,
        line_total,
        CASE
            WHEN unit_price * quantity = 0 THEN 0
            ELSE (discount_amount / (unit_price * quantity)) * 100
        END AS discount_pct
    FROM fact_sales
) t
GROUP BY 1
ORDER BY total_revenue DESC
"""


def split_statements(sql_text: str) -> list[str]:
    """The reference's parser, verbatim: split on ';', strip, drop blanks
    (generate_analytics.py:40-43)."""
    return [s.strip() for s in sql_text.split(";") if s.strip()]


def run_analytics(
    spark: SparkSession,
    output_dir: str | Path,
    run_date: str = RUN_DATE,
    parallelism: int = 4,
) -> dict:
    """Execute the suite over the registered warehouse views; write one CSV
    per query (golden outputs are tiny, S6) plus analytics_summary.json
    (S8, generate_analytics.py:29-61).

    Queries run on a small thread pool: Spark's scheduler interleaves the
    concurrent jobs across executors (and codegen compiles in parallel),
    so the suite's wall time approaches the longest query instead of the
    sum — the standard pattern for independent reporting queries on a
    shared warm cluster.  Results/ordering are unaffected.
    """
    from concurrent.futures import ThreadPoolExecutor

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    statements = split_statements(ANALYTICS_SQL.format(run_date=run_date))
    summary: dict = {"query_results": {}, "total_execution_time_seconds": 0.0}

    def run_one(arg: tuple[int, str]) -> tuple[int, dict]:
        i, stmt = arg
        t0 = time.perf_counter()
        pdf = spark.sql(stmt).toPandas()
        elapsed_ms = (time.perf_counter() - t0) * 1000
        pdf.to_csv(out / f"query{i}.csv", index=False)
        return i, {
            "rows": len(pdf),
            "columns": len(pdf.columns),
            "execution_time_ms": round(elapsed_ms, 2),
        }

    t_all = time.perf_counter()
    with ThreadPoolExecutor(max_workers=max(1, parallelism)) as pool:
        for i, res in pool.map(run_one, list(enumerate(statements, start=1))):
            summary["query_results"][f"query{i}"] = res
    summary["query_results"] = dict(
        sorted(summary["query_results"].items(), key=lambda kv: int(kv[0][5:]))
    )
    summary["total_execution_time_seconds"] = round(time.perf_counter() - t_all, 2)
    with open(out / "analytics_summary.json", "w") as fh:
        json.dump(summary, fh, indent=2)
    return summary
