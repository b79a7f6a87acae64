"""Dedup operators against planted duplicates — semantics the driver's
rows-only check can't verify."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators import dedup as dd

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1 (modulo nothing)
        (3, "  THE  quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the afternoon sun "),  # exact after normalize
        (4, BASE.replace("afternoon", "morning")),  # near dup (1 token)
        (5, "completely different content about spark shuffle partitions "
            "and adaptive query execution plans at scale"),
        (6, "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_groups_fold_normalized_variants(docs):
    groups = dd.exact_duplicate_groups(docs, "text", "doc_id")
    dups = {r.keep_id: r.n_docs for r in groups.filter(F.col("n_docs") > 1).collect()}
    assert dups == {1: 3}  # docs 1, 2, 3 share one fingerprint


def test_drop_exact_keeps_min_id(docs):
    kept = sorted(r.doc_id for r in dd.drop_exact_duplicates(docs, "text", "doc_id").collect())
    assert kept == [1, 4, 5, 6]


def test_jaccard_finds_near_dup(docs):
    pairs = dd.jaccard_pairs(dd.shingle_table(docs, "doc_id", "text"), threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # 1-2, 1-3, 2-3 are identical (j=1.0); 4 is near each of them
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert (1, 4) in got
    assert not any(5 in p or 6 in p for p in got)


def test_minhash_lsh_recalls_planted_dups(docs):
    pairs = dd.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= got  # j=1.0 pairs always collide
    assert not any(5 in p or 6 in p for p in got)


def test_simhash_near_zero_hamming_for_dups(spark, docs):
    pairs = dd.simhash_pairs(docs, "doc_id", "text", max_hamming=10)
    h = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert h[(1, 2)] == 0 and h[(1, 3)] == 0
    assert h[(1, 4)] <= 10
    assert (1, 5) not in h


def test_shingle_table_short_doc_fallback(spark):
    df = spark.createDataFrame([(1, "single")], ["doc_id", "text"])
    rows = dd.shingle_table(df, "doc_id", "text", n=2).collect()
    assert [(r.id, r.shingle) for r in rows] == [(1, "single")]


def test_simhash_chunk_blocking_guarantee(spark):
    """max_hamming > 3 widens the blocking (8x8-bit chunks): a pair with
    4-6 differing bits spread across the four 16-bit chunks must still be
    recalled."""
    import pytest as _pytest

    pairs = dd.simhash_pairs(
        spark.createDataFrame([(1, BASE), (2, BASE)], ["doc_id", "text"]),
        "doc_id",
        "text",
        max_hamming=7,
    )
    assert pairs.collect()[0].hamming == 0
    with _pytest.raises(ValueError):
        dd.simhash_pairs(
            spark.createDataFrame([(1, BASE)], ["doc_id", "text"]),
            "doc_id", "text", max_hamming=20,
        ).collect()


def test_winnow_pairs_find_partial_overlap(spark):
    """Winnowing catches contained/partial reuse that whole-doc
    fingerprints miss: doc 8 embeds doc 7's text inside unrelated text."""
    core = ("the winnowing algorithm selects minimum hashes from sliding "
            "windows over kgram sequences producing robust fingerprints "
            "for plagiarism detection in large corpora")
    rows = [
        (7, core),
        (8, "unrelated prefix content here " + core + " and an unrelated suffix"),
        (9, "completely different text about query optimizers and join order"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.id_a, r.id_b) for r in
             dd.winnow_pairs(df, "doc_id", "text", k=8, window=4, min_shared=5).collect()}
    assert (7, 8) in pairs
    assert not any(9 in p for p in pairs)


def test_minhash_portable_recalls_planted_dups(docs):
    """The md5-permutation MinHash (t17's operator) recalls exact dups
    with certainty (identical shingle sets → identical signatures) and
    filters unrelated documents."""
    shingled = dd.shingle_table(docs, "doc_id", "text")
    pairs = dd.minhash_md5_pairs(shingled, num_perm=32, bands=8, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= got
    assert not any(5 in p or 6 in p for p in got)


def test_minhash_portable_jaccard_values_are_exact(docs):
    shingled = dd.shingle_table(docs, "doc_id", "text")
    by_pair = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.minhash_md5_pairs(shingled, threshold=0.5).collect()
    }
    assert by_pair[(1, 2)] == 1.0


# ----------------------------------------------- cross-run incremental dedup


def _split(docs, delta_ids):
    corpus = docs.filter(~F.col("doc_id").isin(delta_ids))
    delta = docs.filter(F.col("doc_id").isin(delta_ids))
    return corpus, delta


def test_incremental_excludes_corpus_corpus_pairs(docs):
    """Corpus docs 1/2/3 are mutual exact dups — a full recompute pairs
    them, but the incremental run (delta = {4, 6}) must never re-emit a
    corpus×corpus pair, only delta-touching ones."""
    corpus, delta = _split(docs, [4, 6])
    corpus_bands = dd.md5_band_table(
        dd.minhash_md5_signatures(dd.shingle_table(corpus, "doc_id", "text"))
    )
    pairs = dd.minhash_incremental_pairs(
        corpus_bands,
        dd.shingle_table(delta, "doc_id", "text"),
        dd.shingle_table(corpus, "doc_id", "text"),
        threshold=0.5,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all(a in (4, 6) or b in (4, 6) for a, b in got)
    assert (1, 2) not in got and (1, 3) not in got and (2, 3) not in got
    # doc 4 is a near-dup of corpus docs 1/2/3 and must be caught
    assert {(1, 4), (2, 4), (3, 4)} <= got


def test_incremental_equals_full_recompute_restricted_to_delta(docs):
    """The contract the t31 oracle checks cross-engine, pinned here on
    planted data too: incremental == full recompute ∩ delta-touching."""
    corpus, delta = _split(docs, [3, 4])
    shingled_all = dd.shingle_table(docs, "doc_id", "text")
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.minhash_md5_pairs(shingled_all, threshold=0.5).collect()
        if r.id_a in (3, 4) or r.id_b in (3, 4)
    }
    corpus_bands = dd.md5_band_table(
        dd.minhash_md5_signatures(dd.shingle_table(corpus, "doc_id", "text"))
    )
    inc = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.minhash_incremental_pairs(
            corpus_bands,
            dd.shingle_table(delta, "doc_id", "text"),
            dd.shingle_table(corpus, "doc_id", "text"),
            threshold=0.5,
        ).collect()
    }
    assert inc == full


def test_incremental_bucketed_corpus_roundtrip(spark, docs, tmp_path_factory):
    """Production shape: the corpus band index is PERSISTED bucketed by
    bkey and read back — results identical to the in-memory run, the
    corpus side scans as a bucketed table (no re-hash of old docs), and
    the next batch is absorbed by appending delta bands."""
    import io
    from contextlib import redirect_stdout

    from ecommerce_data_pipeline_23a91a05i4_spark.sources.registry import (
        write_bucketed,
    )

    base = tmp_path_factory.mktemp("lsh_index")
    corpus, delta = _split(docs, [4, 6])
    corpus_bands = dd.md5_band_table(
        dd.minhash_md5_signatures(dd.shingle_table(corpus, "doc_id", "text"))
    )
    write_bucketed(
        corpus_bands, "lsh_corpus_bands", str(base / "bands"), "bkey", 4
    )
    try:
        stored = spark.table("lsh_corpus_bands")
        # an aggregate keyed on bkey consumes the bucketed distribution:
        # the scan reports Bucketed: true and plans NO Exchange — the
        # corpus side of the candidate join gets the same treatment
        buf = io.StringIO()
        with redirect_stdout(buf):
            stored.groupBy("bkey").count().explain("formatted")
        plan = buf.getvalue()
        assert "Bucketed: true" in plan and "Exchange" not in plan

        delta_sh = dd.shingle_table(delta, "doc_id", "text")
        corpus_sh = dd.shingle_table(corpus, "doc_id", "text")
        # the verification side is ALSO a persisted store (bucketed by
        # id) — the shape that honors the no-corpus-recompute cost claim
        write_bucketed(
            corpus_sh, "lsh_corpus_shingles", str(base / "shingles"), "id", 4
        )
        from_store = {
            tuple(r)
            for r in dd.minhash_incremental_pairs(
                stored, delta_sh, spark.table("lsh_corpus_shingles"),
                threshold=0.5,
            ).collect()
        }
        in_memory = {
            tuple(r)
            for r in dd.minhash_incremental_pairs(
                corpus_bands, delta_sh, corpus_sh, threshold=0.5
            ).collect()
        }
        assert from_store == in_memory and from_store

        # absorb the batch: append delta bands; the index now covers all
        delta_bands = dd.md5_band_table(dd.minhash_md5_signatures(delta_sh))
        write_bucketed(
            delta_bands, "lsh_corpus_bands", str(base / "bands"), "bkey", 4,
            mode="append",
        )
        n_all = dd.md5_band_table(
            dd.minhash_md5_signatures(dd.shingle_table(docs, "doc_id", "text"))
        ).count()
        assert spark.table("lsh_corpus_bands").count() == n_all
    finally:
        spark.sql("DROP TABLE IF EXISTS lsh_corpus_bands")
        spark.sql("DROP TABLE IF EXISTS lsh_corpus_shingles")


# ------------------------------------------------- segment-level dedup


def test_segment_dedup_drops_shared_boilerplate_keeps_unique(spark):
    """Three docs share one exact 16-token block (boilerplate); each has
    a unique 16-token remainder.  The shared block must be dropped from
    every doc, the unique block kept, and the cleaned text hash must
    equal md5 of exactly the surviving segments rejoined."""
    import hashlib

    boiler = " ".join(f"b{i}" for i in range(16))
    uniq = {d: " ".join(f"u{d}x{i}" for i in range(16)) for d in (1, 2, 3)}
    rows = [(d, boiler + " " + uniq[d]) for d in (1, 2, 3)]
    # doc 4 is ONLY boilerplate: everything dropped, clean hash = md5('')
    rows.append((4, boiler))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.id: r
        for r in dd.segment_dedup(df, "doc_id", "text", seg_tokens=16).collect()
    }
    for d in (1, 2, 3):
        assert (out[d].n_segments, out[d].n_dropped) == (2, 1)
        assert out[d].clean_md5 == hashlib.md5(uniq[d].encode()).hexdigest()
    assert (out[4].n_segments, out[4].n_dropped) == (1, 1)
    assert out[4].clean_md5 == hashlib.md5(b"").hexdigest()


def test_segment_dedup_max_docs_threshold(spark):
    """max_docs=2 tolerates a segment in two docs; only 3+ is dropped."""
    seg = " ".join(f"s{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, seg), (2, seg), (3, "totally different words here")],
        ["doc_id", "text"],
    )
    out = {
        r.id: r.n_dropped
        for r in dd.segment_dedup(
            df, "doc_id", "text", seg_tokens=16, max_docs=2
        ).collect()
    }
    assert out == {1: 0, 2: 0, 3: 0}


# ------------------------------------------------- Bloom membership filter


def test_bloom_screen_has_no_false_negatives_and_rare_fps(spark):
    """The Bloom contract: an exact duplicate of a corpus doc must probe
    all 4 bits set (maybe_dup); novel docs are (at these m/k/n constants,
    fp ~ 1e-9) reported novel."""
    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} words") for i in range(50)],
        ["doc_id", "text"],
    )
    delta = spark.createDataFrame(
        [
            (100, "corpus document number 7 words"),  # exact dup of doc 7
            (101, "a brand new never seen text"),
            (102, "another novel document entirely"),
        ],
        ["doc_id", "text"],
    )
    bits = dd.bloom_bit_table(corpus, "text")
    out = {r.id: r for r in dd.bloom_screen(delta, "doc_id", "text", bits).collect()}
    assert out[100].maybe_dup and out[100].n_hits == dd.BLOOM_HASHES
    assert not out[101].maybe_dup
    assert not out[102].maybe_dup


def test_bloom_bits_match_reference_md5_arithmetic(spark):
    """The probed bit positions are the 4 independent 32-bit md5 slices
    mod m — recomputed here with hashlib so the Spark expression can
    never drift from the documented (and oracle-replayed) construction."""
    import hashlib

    text = "some normalized text"
    h = hashlib.md5(text.encode()).hexdigest()
    want = [int(h[8 * j : 8 * j + 8], 16) % dd.BLOOM_BITS for j in range(4)]
    got = (
        spark.createDataFrame([(text,)], ["t"])
        .select(dd.bloom_bits(F.col("t")).alias("b"))
        .collect()[0]
        .b
    )
    assert got == want


def test_incremental_segment_dedup_equals_full_restricted(spark):
    """The cross-run contract: cleaning a delta batch against the
    persisted corpus segment-frequency store must equal the full
    corpus∪delta recompute restricted to delta documents."""
    boiler = " ".join(f"b{i}" for i in range(16))
    rows = (
        # corpus docs (ids 1-4): two share the boilerplate already
        [(1, boiler + " one unique tail here now ok yes no up down left"),
         (2, boiler + " two other words entirely distinct from one above x"),
         (3, "clean corpus doc with no shared content at all kept whole"),
         (4, "another clean one nothing repeated anywhere in this text")]
        # delta docs (ids 100-101): 100 carries corpus boilerplate,
        # 101 is novel
        + [(100, boiler + " delta unique remainder of document hundred z"),
           (101, "a wholly novel delta document with fresh segments only")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = df.filter(F.col("doc_id") < 100)
    delta = df.filter(F.col("doc_id") >= 100)
    counts = dd.segment_counts(corpus, "doc_id", "text", seg_tokens=16)
    inc = {
        r.id: (r.n_segments, r.n_dropped, r.clean_md5)
        for r in dd.segment_dedup_incremental(
            counts, delta, "doc_id", "text", seg_tokens=16
        ).collect()
    }
    full = {
        r.id: (r.n_segments, r.n_dropped, r.clean_md5)
        for r in dd.segment_dedup(df, "doc_id", "text", seg_tokens=16).collect()
        if r.id >= 100
    }
    assert inc == full
    assert inc[100][1] > 0   # the corpus boilerplate was caught
    assert inc[101][1] == 0  # the novel doc is untouched


def test_segment_counts_store_roundtrip(spark, tmp_path):
    """The frequency store is persistable state: written to parquet and
    read back, the incremental result is unchanged."""
    seg = " ".join(f"s{i}" for i in range(16))
    corpus = spark.createDataFrame(
        [(1, seg + " aa bb"), (2, seg + " cc dd")], ["doc_id", "text"]
    )
    delta = spark.createDataFrame([(100, seg + " ee ff")], ["doc_id", "text"])
    counts = dd.segment_counts(corpus, "doc_id", "text")
    p = str(tmp_path / "segstore.parquet")
    counts.write.parquet(p)
    direct = dd.segment_dedup_incremental(
        counts, delta, "doc_id", "text"
    ).collect()
    via_store = dd.segment_dedup_incremental(
        spark.read.parquet(p), delta, "doc_id", "text"
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_store))
    assert direct[0].n_dropped == 1  # shared segment caught via the store


def test_duplicate_spans_catch_unaligned_copies(spark):
    """A 16-token passage copied at DIFFERENT offsets in two documents
    is invisible to aligned segment hashing but must surface here."""
    passage = " ".join(f"p{i}" for i in range(16))
    rows = [
        (1, "lead-in words here " + passage + " trailer"),
        (2, passage + " completely different tail text"),
        (3, "unrelated document with its own words only"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # aligned segments: doc1's copy starts at offset 3 -> no shared segment
    seg = {r.id: r.n_dropped for r in dd.segment_dedup(df, "doc_id", "text").collect()}
    assert all(v == 0 for v in seg.values())
    # stride-1 spans: the shared passage is caught
    import hashlib

    spans = {r.span_md5: (r.n_docs, r.n_occurrences)
             for r in dd.duplicate_spans(df, "doc_id", "text").collect()}
    want = hashlib.md5(passage.encode()).hexdigest()
    assert spans.get(want) == (2, 2)


def test_index_delete_ids_equals_rebuild_from_survivors(spark, docs):
    """Takedown cascade for per-document stores: anti-joining the
    deleted ids out of band/shingle relations must equal rebuilding the
    store from the surviving corpus (the property that makes the stores
    persistable makes the cascade exact)."""
    deleted = docs.filter(F.col("doc_id").isin(2, 4)).select("doc_id")
    for build in (
        lambda d: dd.shingle_table(d, "doc_id", "text", n=2),
        lambda d: dd.md5_band_table(
            dd.minhash_md5_signatures(dd.shingle_table(d, "doc_id", "text", n=2))
        ),
    ):
        full = build(docs)
        cascaded = dd.index_delete_ids(full, deleted)
        rebuilt = build(docs.filter(~F.col("doc_id").isin(2, 4)))
        assert sorted(map(tuple, cascaded.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )


def test_segment_counts_subtract_equals_recompute_and_unsuppresses(spark):
    """Subtracting a deleted doc's segment counts must (a) equal
    segment_counts(corpus minus deleted) exactly, and (b) un-suppress a
    segment that was boilerplate ONLY because the deleted doc shared it
    — the ghost VERDICT r4 flagged."""
    shared = " ".join(f"s{i}" for i in range(16))
    solo = " ".join(f"q{i}" for i in range(16))
    rows = [
        (1, shared),
        (2, solo),                 # to be deleted: the segment's ONLY holder
        (3, " ".join(f"z{i}" for i in range(16))),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    deleted = corpus.filter(F.col("doc_id") == 2)
    store = dd.segment_counts(corpus, "doc_id", "text")
    cascaded = dd.segment_counts_subtract(store, deleted, "doc_id", "text")
    rebuilt = dd.segment_counts(
        corpus.filter(F.col("doc_id") != 2), "doc_id", "text"
    )
    assert sorted(map(tuple, cascaded.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # before: the deleted doc's segment makes a NEW doc repeating it a
    # duplicate; after the cascade the segment left the corpus entirely,
    # so the new doc's copy is unique and survives
    delta = spark.createDataFrame([(100, solo)], ["doc_id", "text"])
    before = dd.segment_dedup_incremental(store, delta, "doc_id", "text")
    after = dd.segment_dedup_incremental(cascaded, delta, "doc_id", "text")
    assert before.collect()[0].n_dropped == 1
    assert after.collect()[0].n_dropped == 0


def test_duplicate_spans_prescreened_is_lossless_and_prunes(spark):
    """The two-stage path must equal the one-stage result on planted
    unaligned copies (including a short-doc whole-text dup), while the
    candidate set actually excludes the unique documents."""
    passage = " ".join(f"w{i}" for i in range(16))
    rows = [
        (1, "intro words here " + passage + " tail a"),
        (2, passage + " other trailing content entirely"),   # offset copy
        (3, "qqq1 qqq2 qqq3 qqq4 qqq5 qqq6 qqq7"),          # no shared 8-gram
        (4, "short twin"),
        (5, "short twin"),                                    # whole-text dup
        (6, "zzz1 zzz2 zzz3 zzz4 zzz5 zzz6 zzz7"),          # no shared 8-gram
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    one = sorted(map(tuple, dd.duplicate_spans(df, "doc_id", "text").collect()))
    two = sorted(
        map(tuple, dd.duplicate_spans_prescreened(df, "doc_id", "text").collect())
    )
    assert one == two and one  # equal, and non-empty (the plant surfaced)
    # the prescreen really prunes: unique docs are not candidates
    # same derived gram/window the operator uses (2*16 - 8 = 24-char
    # grams, window 8 -> k+w-1 exactly the 31-char span lower bound)
    fp = dd.winnow_fingerprints(df, "doc_id", "text", k=24, window=8)
    hot = (
        fp.groupBy("fingerprint").count().filter(F.col("count") > 1)
        .select("fingerprint")
    )
    cands = {
        r.id for r in fp.join(hot, "fingerprint", "left_semi")
        .select("id").distinct().collect()
    }
    assert {1, 2, 4, 5} <= cands and 3 not in cands and 6 not in cands
