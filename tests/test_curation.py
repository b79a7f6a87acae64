"""Curation operators (PII redaction, repetition filters,
decontamination) against planted inputs where the right answer is known
by hand — the oracle gates (t32-t34) prove cross-engine value parity,
these pin the semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators import curation as cu


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    counts = cu.pii_counts(F.col("text"))
    return df.select(
        counts["email"].alias("e"),
        counts["phone"].alias("p"),
        counts["ipv4"].alias("i"),
        cu.redact_pii(F.col("text")).alias("red"),
    ).collect()[0]


def test_pii_detects_and_redacts_each_kind(spark):
    r = _one(
        spark,
        "mail a.user+tag@sub.example.org or call 555-123-4567 "
        "from host 10.20.30.40 today",
    )
    assert (r.e, r.p, r.i) == (1, 1, 1)
    assert r.red == "mail [PII] or call [PII] from host [PII] today"


def test_pii_clean_text_untouched(spark):
    r = _one(spark, "no personal data in this perfectly ordinary sentence")
    assert (r.e, r.p, r.i) == (0, 0, 0)
    assert r.red == "no personal data in this perfectly ordinary sentence"


def test_pii_ip_redacts_as_single_token_and_counts_once(spark):
    """ipv4 is handled before the phone pattern, so an IP is neither
    half-eaten by the phone regex's NNN[-.]NNNN shape at redaction time
    nor double-counted as a phone (span-exclusive counting: '192.168'
    matches the phone pattern on raw text, but counts are taken on the
    ip-redacted text)."""
    r = _one(spark, "server 192.168.1.1 responded")
    assert r.red == "server [PII] responded"
    assert (r.e, r.p, r.i) == (0, 0, 1)


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a a a b"), (2, "w x y z")], "doc_id long, text string"
    )
    out = {r.id: r for r in cu.word_repetition_stats(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert (r1.n_words, r1.n_distinct_words, r1.top_word_count) == (5, 2, 4)
    assert abs(r1.top_word_ratio - 0.8) < 1e-12
    # bigrams: "a a" x3, "a b" -> 4 total, 2 distinct, dup ratio 0.5
    assert (r1.n_bigrams, r1.n_distinct_bigrams) == (4, 2)
    assert abs(r1.dup_bigram_ratio - 0.5) < 1e-12
    r2 = out[2]
    assert r2.top_word_count == 1 and r2.dup_bigram_ratio == 0.0


def test_repetition_single_word_doc(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    r = cu.word_repetition_stats(df, "doc_id", "text").collect()[0]
    assert (r.n_words, r.n_bigrams, r.dup_bigram_ratio) == (1, 0, 0.0)


def test_contamination_flags_copied_ngrams_only(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "beta gamma delta epsilon zeta"
            (1, "intro words beta gamma delta epsilon zeta outro tail"),
            (2, "totally unrelated content with many different words here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.id: r
        for r in cu.contamination_stats(cands, bench, "doc_id", "text", n=5).collect()
    }
    assert out[1].n_overlap == 1 and out[1].contamination_ratio > 0
    assert out[2].n_overlap == 0 and out[2].contamination_ratio == 0.0
    # every candidate appears exactly once, hit or not
    assert set(out) == {1, 2}


def test_unigram_fluency_ranks_garbage_below_common(spark):
    """A doc of corpus-frequent words must out-score a doc of hapax
    garbage tokens, and micro-probabilities must be integer-exact
    (count·10⁶ DIV total)."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran to the mat"),
        (3, "zxqv wploe brrrk jjjx"),  # all hapax
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in cu.unigram_fluency_stats(df, "doc_id", "text").collect()}
    assert out[3].mean_microp < out[1].mean_microp
    assert out[3].mean_microp < out[2].mean_microp
    # 16 total tokens; 'the' appears 4x -> microp = 4_000_000 // 16
    assert out[1].min_microp == 1_000_000 // 16  # hapax in doc 1 ('sat'...)
    the_microp = 4 * 1_000_000 // 16
    assert out[1].mean_microp <= the_microp
