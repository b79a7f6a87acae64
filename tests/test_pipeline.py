"""End-to-end pipeline invariants — the reference's own test assertions
(tests/test_ingestion.py, test_transformation.py, test_warehouse.py,
test_quality_checks.py) re-expressed against the lakehouse."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_pipeline_all_steps_succeed(pipeline_base):
    _, report = pipeline_base
    assert report["overall_status"] == "success", report
    assert list(report["steps_executed"]) == [
        "data_generation",
        "data_ingestion",
        "staging_to_production",
        "data_quality_checks",
        "warehouse_load",
        "analytics_generation",
    ]


def test_bronze_has_loaded_at(spark, pipeline_base):
    base, _ = pipeline_base
    df = spark.read.parquet(str(base / "bronze" / "customers"))
    assert df.filter(F.col("loaded_at").isNull()).count() == 0


def test_silver_emails_lowercase(spark, pipeline_base):
    base, _ = pipeline_base
    df = spark.read.parquet(str(base / "silver" / "customers"))
    assert df.filter(F.col("email") != F.lower(F.col("email"))).count() == 0


def test_silver_no_orphan_transactions(spark, pipeline_base):
    base, _ = pipeline_base
    txns = spark.read.parquet(str(base / "silver" / "transactions"))
    custs = spark.read.parquet(str(base / "silver" / "customers"))
    orphans = txns.join(custs.select("customer_id"), "customer_id", "left_anti")
    assert orphans.count() == 0


def test_fact_sales_populated_and_consistent(spark, pipeline_base):
    base, _ = pipeline_base
    fact = spark.read.parquet(str(base / "gold" / "fact_sales"))
    items = spark.read.parquet(str(base / "silver" / "transaction_items"))
    assert fact.count() == items.count()  # one fact row per line item
    # every surrogate FK resolves
    for dim, key in [
        ("dim_customers", "customer_key"),
        ("dim_products", "product_key"),
        ("dim_date", "date_key"),
        ("dim_payment_method", "payment_method_key"),
    ]:
        d = spark.read.parquet(str(base / "gold" / dim))
        assert fact.join(d.select(key), key, "left_anti").count() == 0, dim
    # sales_key is a dense unique sequence (SERIAL semantics)
    n = fact.count()
    assert fact.select("sales_key").distinct().count() == n
    assert fact.agg(F.min("sales_key"), F.max("sales_key")).collect()[0] == (1, n)


def test_dim_date_weekend_flag(spark, pipeline_base):
    base, _ = pipeline_base
    d = spark.read.parquet(str(base / "gold" / "dim_date"))
    # ISODOW semantic trap (SURVEY.md F10): weekend == Saturday/Sunday
    bad = d.filter(
        F.col("is_weekend") != F.date_format("full_date", "EEEE").isin("Saturday", "Sunday")
    )
    assert bad.count() == 0


def test_quality_report_clean_data_scores_100(pipeline_base):
    base, _ = pipeline_base
    report = json.loads((base / "reports" / "quality_report.json").read_text())
    assert report["total_violations"] == 0, report["checks"]
    assert report["quality_score"] == 100.0
    assert report["quality_grade"] == "A"


def test_analytics_outputs_written(pipeline_base):
    base, _ = pipeline_base
    adir = base / "analytics"
    for i in range(1, 11):
        assert (adir / f"query{i}.csv").exists()
    summary = json.loads((adir / "analytics_summary.json").read_text())
    assert len(summary["query_results"]) == 10
    assert summary["query_results"]["query1"]["rows"] <= 10


def test_total_amount_equals_item_sums(spark, pipeline_base):
    base, _ = pipeline_base
    txns = spark.read.parquet(str(base / "silver" / "transactions"))
    items = spark.read.parquet(str(base / "silver" / "transaction_items"))
    sums = items.groupBy("transaction_id").agg(F.sum("line_total").alias("s"))
    bad = (
        txns.join(sums, "transaction_id")
        .filter(F.abs(F.col("total_amount") - F.col("s")) > 0.01)
    )
    assert bad.count() == 0


def test_incremental_second_run_appends_nothing(spark, pipeline_base):
    base, _ = pipeline_base
    from ecommerce_data_pipeline_23a91a05i4_spark.pipeline import bronze_to_silver

    before = spark.read.parquet(str(base / "silver" / "transactions")).count()
    bronze_to_silver(spark, base, "2024-01-01 00:00:00", incremental=True)
    after = spark.read.parquet(str(base / "silver" / "transactions")).count()
    assert before == after  # J4 anti-join: same keys → no new rows


def test_datagen_is_deterministic(spark):
    from ecommerce_data_pipeline_23a91a05i4_spark import datagen

    a = datagen.generate_customers(spark, 50).orderBy("customer_id").collect()
    b = datagen.generate_customers(spark, 50).orderBy("customer_id").collect()
    assert a == b
    ids = [r.customer_id for r in a]
    assert ids[0] == "CUST0001" and len(set(ids)) == 50
