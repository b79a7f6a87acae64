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


def test_unigram_fluency_vocab_cap_lumps_tail_at_floor(spark):
    """With vocab_cap binding, out-of-vocabulary tokens score the floor
    while in-vocabulary micro-probabilities keep the FULL-corpus total
    (capping must not inflate in-vocab scores), and ties at the cap
    boundary break by token ascending."""
    rows = [
        (1, "aa aa aa bb bb cc"),  # corpus counts: aa=3, bb=2, cc=2,
        (2, "dd zz cc"),           #                dd=1, zz=1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=3 keeps aa(3) and the count-2 tie {bb, cc} (bb < cc, both fit);
    # dd and zz (count 1) fall out to the floor
    out = {
        r.id: r
        for r in cu.unigram_fluency_stats(
            df, "doc_id", "text", vocab_cap=3, floor_microp=7
        ).collect()
    }
    total = 9
    aa, bb, cc = 3_000_000 // total, 2_000_000 // total, 2_000_000 // total
    assert out[1].mean_microp == (3 * aa + 2 * bb + cc) / 6
    assert out[1].min_microp == cc
    # doc 2: dd and zz are out-of-vocab -> floor 7; cc kept
    assert out[2].mean_microp == (7 + 7 + cc) / 3
    assert out[2].min_microp == 7


def test_unigram_fluency_min_count_filter_matches_cap_semantics(spark):
    """min_count is the sort-free 100 TB knob: tokens below the count
    threshold drop to the floor, identical in effect to an equivalent
    cap when no ties straddle the boundary."""
    rows = [(1, "aa aa aa bb bb cc"), (2, "dd zz cc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    by_count = {
        r.id: r
        for r in cu.unigram_fluency_stats(
            df, "doc_id", "text", min_count=2
        ).collect()
    }
    total = 9
    aa, bb, cc = 3_000_000 // total, 2_000_000 // total, 2_000_000 // total
    assert by_count[1].mean_microp == (3 * aa + 2 * bb + cc) / 6
    assert by_count[1].min_microp == cc
    # doc 2: dd and zz (count 1) fall below the cutoff -> floor 0
    assert by_count[2].mean_microp == (0 + 0 + cc) / 3
    assert by_count[2].min_microp == 0


def test_unigram_fluency_uncapped_unchanged_and_join_tolerates_shuffle(spark):
    """No cap -> identical to the original semantics; and with broadcast
    disabled the token-vocabulary join must fall back to a shuffled join
    (no forced broadcast hint on the vocabulary side), which is what a
    10^9-token web vocabulary needs."""
    import io
    from contextlib import redirect_stdout

    rows = [(i, f"tok{i} tok{i % 7} common") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = cu.unigram_fluency_stats(df, "doc_id", "text")
    capped = cu.unigram_fluency_stats(df, "doc_id", "text", vocab_cap=10_000)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, capped.collect())
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_df = cu.unigram_fluency_stats(df, "doc_id", "text", vocab_cap=10)
        buf = io.StringIO()
        with redirect_stdout(buf):
            plan_df.explain("formatted")
        plan = buf.getvalue()
        # the 1-row corpus total stays an explicit broadcast (nested-loop);
        # the vocabulary join itself must not be a BroadcastHashJoin
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert plan_df.count() == 50  # and it still runs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pii_token_that_matches_a_pattern_is_rejected(spark):
    """A replacement token containing a digit run would itself be
    re-matched by the phone/ipv4 patterns, breaking span exclusivity —
    both entry points must refuse it loudly."""
    import pytest

    for bad in ("x 555-1234 y", "1.2.3.4", "a@b.co"):
        with pytest.raises(ValueError, match="PII"):
            cu.pii_counts(F.col("text"), token=bad)
        with pytest.raises(ValueError, match="PII"):
            cu.redact_pii(F.col("text"), token=bad)
    # the default and other safe tokens still pass
    cu.pii_counts(F.col("text"))
    cu.redact_pii(F.col("text"), token="<redacted>")


def test_classifier_score_matches_reference_arithmetic(spark):
    """The hashed-feature linear score recomputed with hashlib: bucket =
    md5-prefix-32(token) % 1024, weight = (md5-prefix-32('w:'+bucket) %
    2001) - 1000, score = sum — the Spark fold must agree exactly."""
    import hashlib

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    text = "the quick brown fox jumps over the lazy dog"
    want = sum(
        (h32(f"w:{h32(w) % cu.CLS_BUCKETS}") % (2 * cu.CLS_WEIGHT_SPAN + 1))
        - cu.CLS_WEIGHT_SPAN
        for w in text.split()
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = cu.classifier_scores(df, "doc_id", "text").collect()[0]
    assert row.score == want
    assert row.n_tokens == 9
    assert row.keep == (want > 0)


def test_classifier_table_variant_equals_inline_fold(spark):
    """The production weights-table scorer and the inline hash-fold
    scorer must agree exactly when the table enumerates the same
    weights — proving the documented swap is a plan change only."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta eta theta")],
        "doc_id long, text string",
    )
    inline = {
        r.id: (r.n_tokens, r.score, r.keep)
        for r in cu.classifier_scores(df, "doc_id", "text").collect()
    }
    table = {
        r.id: (r.n_tokens, r.score, r.keep)
        for r in cu.classifier_scores_with_table(
            df, "doc_id", "text", cu.weight_table(spark)
        ).collect()
    }
    assert inline == table


def test_extract_domain_first_url_or_empty(spark):
    df = spark.createDataFrame(
        [
            (1, "see http://a.example.com/x and https://b.example.org/y"),
            (2, "no urls at all here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.d
        for r in df.select(
            "doc_id", cu.extract_domain(F.col("text")).alias("d")
        ).collect()
    }
    assert got == {1: "a.example.com", 2: ""}


def test_card_scan_luhn_distinguishes_valid_from_lookalike(spark):
    """The bare 16-digit regex matches both; only the Luhn-valid number
    redacts.  Covers separators, two cards in one doc, and no-card
    text untouched."""
    from ecommerce_data_pipeline_23a91a05i4_spark.operators import (
        curation as cu,
    )

    rows = [
        (1, "pay with 4111-1111-1111-1111 now"),
        (2, "order 4111 1111 1111 1112 shipped"),  # checksum fails
        (3, "invoice 5500 0000 0000 0004 and 4111-1111-1111-1111"),
        (4, "no cards here 123-456"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.id: r for r in cu.card_scan(df, "doc_id", "text").collect()}
    assert (got[1].n_candidates, got[1].n_valid) == (1, 1)
    assert got[1].redacted == "pay with [CARD] now"
    assert (got[2].n_candidates, got[2].n_valid) == (1, 0)
    assert got[2].redacted == rows[1][1]  # lookalike NOT redacted
    assert (got[3].n_candidates, got[3].n_valid) == (2, 2)
    assert got[3].redacted == "invoice [CARD] and [CARD]"
    assert (got[4].n_candidates, got[4].n_valid) == (0, 0)


def test_trained_classifier_actually_learns_the_planted_signal(spark):
    """The t60 gate proves cross-engine determinism; this proves the
    LEARNING: on the planted-marker task the trained model must reach
    perfect accuracy at the self-calibrated threshold, and the marker's
    feature bucket must carry (one of) the largest positive weights —
    an untrained or diverged model passes neither."""
    from ecommerce_data_pipeline_23a91a05i4_spark.operators import (
        curation as cu,
        dedup as dd,
    )
    from ecommerce_data_pipeline_23a91a05i4_spark.plans import llmdata

    out = llmdata.t60_classifier_training(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows and all(bool(r.predicted) == (r.y == 1) for r in rows)
    # weight inspection: rebuild the trained weights and find the
    # marker token's bucket at the top
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    did = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.when(
            did % 3 == 0,
            F.concat(F.col("text"), F.lit(llmdata.CLS_TRAIN_MARKER)),
        ).otherwise(F.col("text")).alias("text"),
    )
    feats = cu.hashed_count_features(aug, "doc_id", "text")
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(did % 3 == 0, 1.0).otherwise(0.0).alias("y"),
    )
    w = cu.train_linear_classifier(
        feats, labels, iters=llmdata.CLS_TRAIN_ITERS, lr=llmdata.CLS_TRAIN_LR
    )
    marker_bucket = spark.range(1).select(
        (dd.md5_hash32(F.lit("qualmark")) % cu.CLS_BUCKETS).alias("b")
    ).collect()[0].b
    assert w[marker_bucket] == max(w.values())


def test_bigram_fluency_interpolation_and_backoff(spark):
    """Hand-computed corpus: 'a b a b' + 'a a'.  uni: a=4, b=2, total 6
    -> up(a)=666666, up(b)=333333; bigrams (a,b)=2, (b,a)=1, (a,a)=1
    -> bp(a,b)=500000, bp(b,a)=500000, bp(a,a)=250000.  Interpolated
    position scores (70/30 DIV 100) and position-1 backoff are checked
    exactly; then a bigram_cap of 1 keeps only (a,b) and every other
    position backs off to its unigram score."""
    from ecommerce_data_pipeline_23a91a05i4_spark.operators import (
        curation as cu,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a")], "doc_id long, text string"
    )
    out = {
        r.id: r
        for r in cu.bigram_fluency_stats(docs, "doc_id", "text").collect()
    }
    # doc1: [up(a)=666666, (70*500000+30*333333)//100=449999,
    #        (70*500000+30*666666)//100=549999, 449999]
    assert out[1].n_tokens == 4
    assert out[1].mean_fluency == (666666 + 449999 + 549999 + 449999) / 4
    assert out[1].min_fluency == 449999
    # doc2: [666666, (70*250000+30*666666)//100=374999]
    assert out[2].mean_fluency == (666666 + 374999) / 2
    assert out[2].min_fluency == 374999
    # bigram_cap=1 keeps only (a,b): all other positions back off
    capped = {
        r.id: r
        for r in cu.bigram_fluency_stats(
            docs, "doc_id", "text", bigram_cap=1
        ).collect()
    }
    assert capped[1].mean_fluency == (666666 + 449999) * 2 / 4
    assert capped[2].mean_fluency == 666666.0
    # vocab_cap=1 keeps only 'a' (up(b)=0), but the kept (a,b) bigram
    # still contributes: b at position 2/4 scores (70*500000+30*0)//100
    # — bigram evidence survives unigram OOV, the interpolation's point
    vcap = {
        r.id: r
        for r in cu.bigram_fluency_stats(
            docs, "doc_id", "text", vocab_cap=1, bigram_cap=1
        ).collect()
    }
    assert vcap[1].min_fluency == 350000
    assert vcap[1].mean_fluency == (666666 + 350000) * 2 / 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lam_num"):
        cu.bigram_fluency_stats(docs, "doc_id", "text", lam_num=101)
