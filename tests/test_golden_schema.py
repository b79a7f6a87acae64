"""Schema-golden parity with the reference's committed analytics outputs.

The reference's committed CSVs are value-stale (generated from an older
dataset — BASELINE.md caveat), so they are *schema*-golden: our warehouse
analytics must emit exactly the reference's column headers, per query
(reference: /root/reference/data/processed/analytics/query{N}.csv).
"""

from __future__ import annotations

import csv
from pathlib import Path

import pytest

REFERENCE_HEADERS = {
    1: ["product_name", "category", "total_revenue", "units_sold", "avg_price"],
    2: ["year_month", "total_revenue", "total_transactions", "average_order_value", "unique_customers"],
    3: ["spending_segment", "customer_count", "total_revenue", "avg_transaction_value"],
    4: ["category", "total_revenue", "total_profit", "profit_margin_pct", "units_sold"],
    5: ["payment_method", "transaction_count", "total_revenue", "pct_of_transactions", "pct_of_revenue"],
    6: ["state", "total_revenue", "total_customers", "avg_revenue_per_customer"],
    7: ["customer_id", "full_name", "total_spent", "transaction_count", "days_since_registration", "avg_order_value"],
    8: ["product_name", "category", "total_profit", "profit_margin", "revenue", "units_sold"],
    9: ["day_name", "avg_daily_revenue", "avg_daily_transactions", "total_revenue"],
    10: ["discount_range", "avg_discount_pct", "total_quantity_sold", "total_revenue", "avg_line_total"],
}


@pytest.mark.parametrize("qnum", sorted(REFERENCE_HEADERS))
def test_analytics_csv_headers_match_reference(pipeline_base, qnum):
    base, _ = pipeline_base
    path = Path(base) / "analytics" / f"query{qnum}.csv"
    with open(path) as fh:
        header = next(csv.reader(fh))
    assert header == REFERENCE_HEADERS[qnum]


@pytest.mark.parametrize("qnum", sorted(REFERENCE_HEADERS))
def test_reference_headers_are_transcribed_correctly(qnum):
    """Guard the transcription above against drift: if the reference's
    committed goldens are readable, our constant must match them."""
    ref = Path(f"/root/reference/data/processed/analytics/query{qnum}.csv")
    if not ref.exists():
        pytest.skip("reference goldens not present")
    with open(ref) as fh:
        header = next(csv.reader(fh))
    assert header == REFERENCE_HEADERS[qnum]
