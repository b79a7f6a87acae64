"""Seeded synthetic ecommerce data generator (reference:
scripts/data_generation/generate_data.py:45-175).

Reference semantics preserved: ID formats (CUST%04d/PROD%04d/TXN%06d/
ITEM%06d/SUP%03d), value domains (price U(200,5000), cost=price·U(0.5,0.8),
discount ∈ {0,5,10,15}, qty 1-4, 1-5 items/txn, payment methods, age
groups), and the two invariants line_total = round(qty·price·(1-disc/100),2)
and total_amount = Σ line_total per transaction.

Implementation is Spark-first and scale-safe: spark.range(n) plus
hash-derived pseudo-randomness (xxhash64(id, seed-k) — deterministic under
any partitioning/cluster size, unlike rand(seed) which depends on partition
layout).  The reference's Faker strings become deterministic picks from
literal vocabularies.
"""

from __future__ import annotations

from math import gcd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.keys import dense_sequence

RUN_DATE = "2024-01-01"  # deterministic "today" (SURVEY.md F12)

FIRST_NAMES = [
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
    "Linda", "David", "Elizabeth", "William", "Barbara", "Richard", "Susan",
    "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen", "Priya",
    "Amit", "Zachary", "Katrina", "Ananya", "Rahul", "Sneha", "Vikram",
]
LAST_NAMES = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Moore", "Taylor", "Anderson",
    "Thomas", "Jackson", "White", "Harris", "Sharma", "Patel", "Gupta",
]
CITIES = [
    "Springfield", "Riverton", "Fairview", "Georgetown", "Clinton",
    "Greenville", "Bristol", "Salem", "Madison", "Oxford", "Williemouth",
    "Ashland", "Milton", "Auburn", "Dayton", "Lexington",
]
STATES = [
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana",
    "Maine", "Maryland", "Massachusetts", "Michigan", "Minnesota",
    "Mississippi", "Missouri", "Montana", "Nebraska", "Nevada",
    "New Hampshire", "New Jersey", "New Mexico", "New York",
    "North Carolina", "North Dakota", "Ohio", "Oklahoma", "Oregon",
    "Pennsylvania", "Rhode Island", "South Carolina", "South Dakota",
    "Tennessee", "Texas", "Utah", "Vermont", "Virginia", "Washington",
    "West Virginia", "Wisconsin", "Wyoming",
]
AGE_GROUPS = ["18-25", "26-35", "36-45", "46-60", "60+"]
CATEGORIES = {
    "Electronics": ["Mobiles", "Laptops", "Accessories"],
    "Clothing": ["Men", "Women", "Kids"],
    "Home & Kitchen": ["Furniture", "Appliances", "Decor"],
    "Books": ["Fiction", "Non-fiction", "Academic"],
    "Sports": ["Outdoor", "Indoor", "Fitness"],
    "Beauty": ["Skincare", "Makeup", "Fragrance"],
}
PRODUCT_WORDS = [
    "major", "bright", "swift", "prime", "nova", "alpha", "metro", "zen",
    "pulse", "vertex", "lunar", "solar", "rapid", "crystal", "ember",
    "quartz", "falcon", "atlas", "orbit", "delta",
]
BRAND_WORDS = [
    "Bates-Moore", "Klein Group", "Hoffman Inc", "Reyes LLC", "Munoz PLC",
    "Walker Ltd", "Stone & Co", "Hayes Corp", "Dean Bros", "Frost Labs",
]
PAYMENT_METHODS = [
    "Credit Card", "Debit Card", "UPI", "Cash on Delivery", "Net Banking",
]
STREETS = ["Paul Flats", "Oak Avenue", "Maple Street", "Hill Road", "Lake View"]


def _h(col: Column, salt: int) -> Column:
    """Deterministic non-negative 63-bit hash stream, independent per salt."""
    return F.abs(F.xxhash64(col, F.lit(salt)))


def _pick(col: Column, salt: int, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(col, salt) % len(values) + 1).cast("int"))


def generate_customers(spark: SparkSession, n: int, run_date: str = RUN_DATE) -> DataFrame:
    df = spark.range(1, n + 1)
    cid = F.col("id")
    first = _pick(cid, 1, FIRST_NAMES)
    last = _pick(cid, 2, LAST_NAMES)
    return df.select(
        F.format_string("CUST%04d", cid).alias("customer_id"),
        first.alias("first_name"),
        last.alias("last_name"),
        F.lower(F.concat(first, F.lit("."), last, cid.cast("string"), F.lit("@example.net")))
        .alias("email"),
        F.format_string(
            "%03d-%03d-%04d",
            _h(cid, 3) % 900 + 100,
            _h(cid, 4) % 900 + 100,
            _h(cid, 5) % 10000,
        ).alias("phone"),
        F.date_sub(F.lit(run_date).cast("date"), (_h(cid, 6) % 1095).cast("int"))
        .alias("registration_date"),
        _pick(cid, 7, CITIES).alias("city"),
        _pick(cid, 8, STATES).alias("state"),
        F.lit("India").alias("country"),
        _pick(cid, 9, AGE_GROUPS).alias("age_group"),
    )


def generate_products(spark: SparkSession, n: int) -> DataFrame:
    df = spark.range(1, n + 1)
    pid = F.col("id")
    cats = list(CATEGORIES)
    cat = _pick(pid, 11, cats)
    # sub-category depends on the category pick: nested CASE over the map
    sub = F.lit(None).cast("string")
    for c, subs in CATEGORIES.items():
        sub = F.when(cat == c, _pick(pid, 12, subs)).otherwise(sub)
    price = (F.lit(200.0) + (_h(pid, 13) % 480001) / 100.0).cast("decimal(10,2)")
    cost_frac = F.lit(0.5) + (_h(pid, 14) % 3001) / 10000.0  # U(0.5, 0.8)
    return df.select(
        F.format_string("PROD%04d", pid).alias("product_id"),
        F.initcap(
            F.concat_ws(" ", _pick(pid, 15, PRODUCT_WORDS), _pick(pid, 16, PRODUCT_WORDS))
        ).alias("product_name"),
        cat.alias("category"),
        sub.alias("sub_category"),
        price.alias("price"),
        F.round(price * cost_frac, 2).cast("decimal(10,2)").alias("cost"),
        _pick(pid, 17, BRAND_WORDS).alias("brand"),
        (_h(pid, 18) % 491 + 10).cast("int").alias("stock_quantity"),
        F.format_string("SUP%03d", _h(pid, 19) % 100 + 1).alias("supplier_id"),
    )


def generate_transactions_skeleton(
    spark: SparkSession, n: int, n_customers: int
) -> DataFrame:
    """Transactions without total_amount (backfilled from items,
    reference generate_data.py:172-174)."""
    df = spark.range(1, n + 1)
    tid = F.col("id")
    return df.select(
        tid.alias("_txn_seq"),
        F.format_string("TXN%06d", tid).alias("transaction_id"),
        F.format_string("CUST%04d", _h(tid, 21) % n_customers + 1).alias("customer_id"),
        F.date_add(F.lit("2023-01-01").cast("date"), (_h(tid, 22) % 365).cast("int"))
        .alias("transaction_date"),
        F.format_string(
            "%02d:%02d:%02d", _h(tid, 23) % 24, _h(tid, 24) % 60, _h(tid, 25) % 60
        ).alias("transaction_time"),
        _pick(tid, 26, PAYMENT_METHODS).alias("payment_method"),
        F.concat(
            (_h(tid, 27) % 900 + 100).cast("string"),
            F.lit(" "),
            _pick(tid, 28, STREETS),
            F.lit(", "),
            _pick(tid, 29, CITIES),
            F.lit(", "),
            _pick(tid, 30, STATES),
            F.format_string(" %05d", _h(tid, 31) % 100000),
        ).alias("shipping_address"),
    )


def generate_transaction_items(
    spark: SparkSession,
    transactions: DataFrame,
    products: DataFrame,
    n_products: int,
) -> DataFrame:
    """1-5 items per transaction, products sampled without replacement
    within a transaction (reference generate_data.py:141-175).

    Without-replacement sampling uses a (start + seq·step) mod N walk with
    step drawn from the multiplicative units mod N — distinct products for
    up to 5 picks, fully deterministic, no shuffle.
    """
    units = [s for s in range(1, n_products) if gcd(s, n_products) == 1]
    step_arr = F.array(*[F.lit(s) for s in units])

    t = transactions.select("_txn_seq", "transaction_id")
    exploded = t.select(
        "_txn_seq",
        "transaction_id",
        F.explode(F.sequence(F.lit(0), (_h(F.col("_txn_seq"), 41) % 5).cast("int")))
        .alias("_item_seq"),
    )
    start = _h(F.col("_txn_seq"), 42) % n_products
    step = F.element_at(
        step_arr, (_h(F.col("_txn_seq"), 43) % len(units) + 1).cast("int")
    )
    with_product = exploded.select(
        "_txn_seq",
        "_item_seq",
        "transaction_id",
        F.format_string(
            "PROD%04d", (start + F.col("_item_seq") * step) % n_products + 1
        ).alias("product_id"),
        (_h(F.col("_txn_seq") * 10 + F.col("_item_seq"), 44) % 4 + 1)
        .cast("int")
        .alias("quantity"),
        F.element_at(
            F.array(F.lit(0), F.lit(5), F.lit(10), F.lit(15)),
            (_h(F.col("_txn_seq") * 10 + F.col("_item_seq"), 45) % 4 + 1).cast("int"),
        )
        .cast("decimal(5,2)")
        .alias("discount_percentage"),
    )
    priced = with_product.join(
        F.broadcast(products.select("product_id", "price")), "product_id"
    ).select(
        "_txn_seq",
        "_item_seq",
        "transaction_id",
        "product_id",
        "quantity",
        F.col("price").alias("unit_price"),
        "discount_percentage",
        F.round(
            F.col("quantity") * F.col("price") * (1 - F.col("discount_percentage") / 100),
            2,
        )
        .cast("decimal(12,2)")
        .alias("line_total"),
    )
    # Dense ITEM%06d counter.  Items are fact-scale, so the counter uses
    # dense_sequence (operators/keys.py) over the unique composite
    # (_txn_seq*8 + _item_seq): a bounded window at generator scale, the
    # distributed numbering beyond the 4M-row threshold.
    keyed = priced.withColumn(
        "_item_order", F.col("_txn_seq") * 8 + F.col("_item_seq")
    )
    # persist=False: the input is hash-derived from spark.range — recompute
    # is cheaper than caching generator output.
    return dense_sequence(
        keyed, "_item_no", "_item_order", key_type="bigint", persist=False
    ).withColumn(
        "item_id", F.format_string("ITEM%06d", F.col("_item_no"))
    ).select(
        "item_id",
        "transaction_id",
        "product_id",
        "quantity",
        "unit_price",
        "discount_percentage",
        "line_total",
    )


def generate_all(
    spark: SparkSession,
    n_customers: int = 1000,
    n_products: int = 500,
    n_transactions: int = 10000,
    run_date: str = RUN_DATE,
) -> dict[str, DataFrame]:
    """Full dataset with the reference's referential invariants
    (total_amount backfilled as Σ line_total — J6/A7)."""
    customers = generate_customers(spark, n_customers, run_date)
    products = generate_products(spark, n_products)
    skeleton = generate_transactions_skeleton(spark, n_transactions, n_customers)
    # items feeds BOTH its own sink and the transactions total backfill —
    # persist so the two consumers share one evaluation
    items = generate_transaction_items(spark, skeleton, products, n_products).persist()
    totals = items.groupBy("transaction_id").agg(
        F.sum("line_total").cast("decimal(12,2)").alias("total_amount")
    )
    transactions = (
        skeleton.join(totals, "transaction_id", "left")
        .select(
            "transaction_id",
            "customer_id",
            "transaction_date",
            "transaction_time",
            "payment_method",
            "shipping_address",
            F.coalesce(F.col("total_amount"), F.lit(0).cast("decimal(12,2)"))
            .alias("total_amount"),
        )
    )
    return {
        "customers": customers,
        "products": products,
        "transactions": transactions,
        "transaction_items": items,
    }
