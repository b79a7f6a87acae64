"""LLM training-data pipeline queries over the documents/embeddings tables
(north-star extensions beyond the reference surface — BASELINE.json):

    t1 text stats           (token/char/unique counts, avg token len, punct)
    t2 language ID          (stopword-marker heuristic, argmax w/ priority)
    t3 quality scoring      (composite score + A-D grade)
    t4 exact dedup          (md5 fingerprint groups)
    t5 n-gram Jaccard pairs (bigram shingles, hot-shingle cap, τ=0.3)
    t6 kNN cosine top-10    (brute-force, queries = vec_id < 10)
    t7 embedding near-dup   (all-pairs cosine ≥ 0.35)
    t8 MinHash-LSH pairs    (rows-only: engine hash functions differ)
    t9 SimHash pairs        (rows-only: engine hash functions differ)

t1-t7 have exact DuckDB oracles; t8/t9 use xxhash64 which has no DuckDB
twin, so the driver records the weaker rows-only check (their *semantics*
are pytest-verified against planted duplicates instead).

Integer outputs are cast to long: Spark size()/length() return int32 while
DuckDB len()/length() return int64, and the driver compares dtypes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exprs import quant
from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text as tx

JACCARD_THRESHOLD = 0.3
JACCARD_MAX_DOC_FREQ = 125  # 25% of the 500-doc corpus at sf0.01
NEARDUP_COSINE = 0.35
KNN_QUERY_MAX_ID = 10


def t1_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        "source",
        F.length(text).cast("long").alias("n_chars"),
        tx.token_count(text).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tx.tokens(text))).cast("long").alias("n_unique_tokens"),
        tx.avg_token_len(text).alias("avg_token_len"),
        tx.punct_ratio(text).alias("punct_ratio"),
        tx.content_fingerprint(text).alias("fingerprint"),
    ).orderBy("doc_id")


def t2_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    text = F.col("text")
    scores = tx.lang_scores(text)
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        tx.predicted_lang(text).alias("predicted_lang"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in tx.LANG_PRIORITY],
    ).orderBy("doc_id")


def t3_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    text = F.col("text")
    score = tx.quality_score(text)
    return docs.select(
        "doc_id",
        tx.token_count(text).cast("long").alias("token_count"),
        tx.stopword_count(text).cast("long").alias("stopword_count"),
        score.alias("quality_score"),
        tx.quality_grade(score).alias("quality_grade"),
    ).orderBy("doc_id")


def t4_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        dd.exact_duplicate_groups(docs, "text", "doc_id")
        .select(
            "fingerprint",
            F.col("n_docs").alias("n_docs"),
            F.col("keep_id").alias("keep_doc_id"),
        )
        .orderBy("fingerprint")
    )


def t5_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    shingled = dd.shingle_table(docs, "doc_id", "text", n=2)
    pairs = dd.jaccard_pairs(
        shingled, threshold=JACCARD_THRESHOLD, max_doc_freq=JACCARD_MAX_DOC_FREQ
    )
    return pairs.select(
        "id_a", "id_b", quant(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def t6_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_QUERY_MAX_ID)
    out = sim.knn_bruteforce(queries, emb, k=10)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine_sim"
    ).orderBy("query_id", "rank")


def t7_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return sim.embedding_neardup_pairs(emb, NEARDUP_COSINE).orderBy("id_a", "id_b")


def t7b_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for t7: SRP-LSH banded blocking then exact cosine on
    candidates only — no cross join anywhere in the plan (asserted by
    tests/test_plan_quality.py).  The oracle mirrors the plan-literal
    hyperplanes, so the banding itself is verified cross-engine."""
    emb = table(spark, sf_dir, "embeddings")
    return sim.embedding_neardup_pairs_lsh(emb, NEARDUP_COSINE).orderBy(
        "id_a", "id_b"
    )


def t8_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only for the driver: xxhash64 has no cross-engine oracle."""
    docs = table(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs(
        docs, "doc_id", "text", n=2, num_perm=32, bands=8, threshold=JACCARD_THRESHOLD
    )
    return pairs.select(
        "id_a", "id_b", quant(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def t9_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only for the driver: xxhash64 has no cross-engine oracle."""
    docs = table(spark, sf_dir, "documents")
    return (
        dd.simhash_pairs(docs, "doc_id", "text", max_hamming=6)
        .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
        .orderBy("id_a", "id_b")
    )
