"""Cross-engine numeric helpers: the decimal-accumulation + quantization
contract that every oracle-checked query depends on."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.functions.exprs import (
    SQL_QUANT,
    dsum,
    quant,
)


def test_quant_matches_duckdb_on_half_cases(spark):
    # 12.345 is the classic divergence: Spark round() gives 12.35,
    # DuckDB round() gives 12.34.  quant/SQL_QUANT must agree instead.
    values = [12.345, 2.675, 0.125, 99.995, -1.005, 1234.56789]
    sdf = spark.createDataFrame([(v,) for v in values], ["x"])
    got = [r[0] for r in sdf.select(quant(F.col("x"), 2)).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {SQL_QUANT('CAST(? AS DOUBLE)', 2)}", [v]).fetchone()[0]
        for v in values
    ]
    assert got == want


def test_dsum_is_order_independent(spark):
    vals = [(i, 0.1 + i * 1e-9) for i in range(10000)]
    df = spark.createDataFrame(vals, ["k", "v"])
    a = df.repartition(1).agg(dsum(F.col("v"))).collect()[0][0]
    b = df.repartition(32).agg(dsum(F.col("v"))).collect()[0][0]
    assert a == b


def test_approx_distinct_within_rsd(spark):
    from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table
    from ecommerce_data_pipeline_23a91a05i4_spark.functions.exprs import approx_distinct

    import pyspark.sql.functions as F

    orders = table(spark, "/root/testdata/sf0.01", "orders")
    exact, approx = orders.agg(
        F.countDistinct("o_custkey"), approx_distinct(F.col("o_custkey"))
    ).collect()[0]
    assert abs(approx - exact) / exact < 0.05
