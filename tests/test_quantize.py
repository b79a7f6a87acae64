"""Int8 embedding quantization (operators/quantize.py).

The t65 gate proves cross-engine bit-identity of the whole pipeline;
these tests pin the numeric CONTRACTS the gate can't see: the
reconstruction-error bound, the recall-vs-exact trade, edge vectors
(all-zero), the code range/dtype that justifies the 8x storage claim,
and partitioning independence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators import quantize as qz
from ecommerce_data_pipeline_23a91a05i4_spark.operators import similarity as sim

SF_SMOKE = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_codes_fit_tinyint_and_schema(spark):
    q = qz.quantize_embeddings(_emb(spark))
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    bounds = q.select(
        F.aggregate(
            "qvec",
            F.lit(0),
            lambda acc, c: F.greatest(acc, F.abs(c.cast("int"))),
        ).alias("m")
    ).agg(F.max("m")).first()[0]
    assert bounds <= qz.QUANT_LEVELS


def test_reconstruction_error_bounded(spark):
    """|x - code*scale| <= scale/2 per element (round-half-up bound)."""
    e = _emb(spark)
    q = qz.quantize_embeddings(e)
    joined = e.join(q, e.vec_id == q.vec_id).select(
        "scale",
        F.aggregate(
            F.zip_with(
                "embedding",
                qz.dequantize(F.col("qvec"), F.col("scale")),
                lambda x, r: F.abs(x.cast("double") - r),
            ),
            F.lit(0.0),
            lambda acc, d: F.greatest(acc, d),
        ).alias("max_err"),
    )
    bad = joined.filter(
        F.col("max_err") > F.col("scale") / 2.0 + 1e-12
    ).count()
    assert bad == 0


def test_recall_vs_exact_knn(spark):
    """Quantized top-10 must recover >= 90% of the exact top-10."""
    e = _emb(spark)
    queries = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.knn_bruteforce(queries, e, k=10).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in qz.knn_quantized(queries, e, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, f"recall@10 {recall}"


def test_zero_vector_is_safe(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in qz.quantize_embeddings(df).collect()}
    assert rows[0].scale == 0.0 and list(rows[0].qvec) == [0, 0, 0]
    # max element maps to +-levels exactly
    assert max(abs(c) for c in rows[1].qvec) == qz.QUANT_LEVELS
    # (a zero-NORM vector makes cosine itself 0/0 — an ANSI error on
    # the exact path and the quantized path alike; the quantizer's own
    # contract is just: no division blow-up producing the codes)


def test_partitioning_independence(spark):
    e = _emb(spark)
    a = sorted(
        (r.vec_id, r.scale, tuple(r.qvec))
        for r in qz.quantize_embeddings(e).collect()
    )
    b = sorted(
        (r.vec_id, r.scale, tuple(r.qvec))
        for r in qz.quantize_embeddings(e.repartition(13)).collect()
    )
    assert a == b


def test_oracle_levels_in_sync():
    """The t65 oracle hardcodes 127.0 (SQL literal); pin it to the
    operator constant so a drift fails here, not at the driver."""
    from ecommerce_data_pipeline_23a91a05i4_spark.plans.oracles import (
        LLMDATA_ORACLES,
    )

    for gate in ("t65_quantized_knn", "t69_quantized_ann"):
        assert (
            f"/ {float(qz.QUANT_LEVELS)} AS scale" in LLMDATA_ORACLES[gate]
        ), gate


def test_lsh_quantized_identical_vector_always_recalled(spark):
    """An exact duplicate quantizes to identical codes → identical
    bucket → always rank 1 with qcosine 1.0 (the guarantee bucketed
    ANN does make; moderate-similarity recall is a tunable, same as
    similarity.knn_lsh)."""
    e = _emb(spark)
    dup = e.filter(F.col("vec_id") == 42).select(
        F.lit(100000).cast("long").alias("vec_id"), "embedding"
    )
    corpus = e.select("vec_id", "embedding").unionByName(dup)
    q = corpus.filter(F.col("vec_id") == 100000)
    top = qz.knn_lsh_quantized(q, corpus, k=3, n_planes=4).collect()
    assert top and top[0].neighbor_id == 42 and top[0].qcosine_sim == 1.0


def test_lsh_quantized_scores_agree_with_bruteforce(spark):
    """Every (query, neighbor) the bucketed path returns must carry
    EXACTLY the similarity the brute-force quantized path computes for
    that pair — bucketing restricts candidates, never alters scores."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 10)
    brute = {
        (r.query_id, r.neighbor_id): r.qcosine_sim
        for r in qz.knn_quantized(q, e, k=10_000).collect()
    }
    for r in qz.knn_lsh_quantized(q, e, k=10, n_planes=4).collect():
        assert brute[(r.query_id, r.neighbor_id)] == r.qcosine_sim


def test_lsh_quantized_plan_is_bucket_hash_join(spark):
    """The scale claim: candidates come from a bucket EQUIJOIN (hash
    join), never a cartesian/nested-loop over the corpus (which is
    what knn_quantized's crossJoin deliberately does)."""
    import io
    from contextlib import redirect_stdout

    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 10)
    df = qz.knn_lsh_quantized(q, e, k=10, n_planes=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


# ------------------------------------------------ product quantization

def test_pq_codes_shape_and_determinism(spark):
    emb = _emb(spark)
    books = qz.pq_train(emb, train_mod=2)
    # m codebooks of ksub codewords each, dim/m-wide centroids
    assert books.count() == qz.PQ_M * qz.PQ_KSUB
    row = books.first()
    assert len(row.centroid) == 64 // qz.PQ_M
    enc = qz.pq_encode(emb, books)
    assert enc.count() == emb.count()
    r = enc.first()
    assert len(r.codes) == qz.PQ_M
    assert all(0 <= c < qz.PQ_KSUB for c in r.codes)
    # deterministic end to end: retraining + re-encoding is identical
    books2 = qz.pq_train(emb, train_mod=2)
    enc2 = qz.pq_encode(emb, books2)
    assert enc.exceptAll(enc2).count() == 0
    assert enc2.exceptAll(enc).count() == 0


def test_pq_recall_with_refine_meets_bar(spark):
    """The VERDICT r7 pin: recall@10 of the PQ stack vs exact kNN
    >= 0.85.  Codes alone plateau near 0.4-0.6 on this weakly
    clustered corpus (4-bit cells are coarser than the true top-10
    gaps); the published shortlist+refine composition is what carries
    the bar, touching floats for only `refine` rows per query."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    exact = sim.knn_bruteforce(queries, emb, k=10).localCheckpoint()
    total = exact.count()
    books = qz.pq_train(emb, train_mod=2).localCheckpoint(eager=True)
    out = qz.knn_pq(queries, emb, books, k=10, refine=100)
    hits = out.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "leftsemi",
    ).count()
    assert hits / total >= 0.85
    # the refined top-k carries EXACT cosines: spot-agree with the
    # brute-force scores on the intersection
    both = out.join(exact, ["query_id", "neighbor_id"]).select(
        (F.col("pq_cosine") == F.col("cosine_sim")).alias("same")
    )
    assert both.filter(~F.col("same")).count() == 0
    # refine must exceed k, loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="refine"):
        qz.knn_pq(queries, emb, books, k=10, refine=10)


def test_pq_adc_scores_from_stored_codes_without_candidate_floats(spark):
    """The scale contract: with a pre-encoded ``codes=`` relation (the
    persisted-store entry point) and no refine, ADC scoring must never
    evaluate the candidate side's float vectors — proven by handing in
    a candidates frame whose embedding column raise_error()s if ever
    read.  The scores must equal the encode-inline path's exactly."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    books = qz.pq_train(emb, train_mod=4).localCheckpoint(eager=True)
    enc = qz.pq_encode(emb, books).localCheckpoint(eager=True)
    poisoned = emb.select(
        "vec_id",
        F.raise_error(F.lit("ADC read candidate floats")).cast(
            "array<float>"
        ).alias("embedding"),
    )
    out = qz.knn_pq(queries, poisoned, books, k=3, codes=enc)
    inline = qz.knn_pq(queries, emb, books, k=3)
    assert out.exceptAll(inline).count() == 0
    assert inline.exceptAll(out).count() == 0
    assert out.count() == 3 * queries.count()


def test_pq_lsh_buckets_and_recall_floor(spark):
    """knn_pq_lsh: SRP coarse partitioner over the code
    RECONSTRUCTION (store holds no floats).  A vector is always in
    its own reconstruction's bucket's candidate set when queried with
    itself removed... weaker than identity recall: pin a modest
    recall floor and that every returned pair shares a bucket."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    books = qz.pq_train(emb, train_mod=2).localCheckpoint(eager=True)
    out = qz.knn_pq_lsh(queries, emb, books, k=10, n_planes=2)
    exact = sim.knn_bruteforce(queries, emb, k=10)
    total = exact.count()
    hits = out.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "leftsemi",
    ).count()
    assert hits / total >= 0.15  # bucket-restricted floor, n_planes=2
    assert out.count() > 0


def test_pq_dim_mismatch_fails_loudly(spark):
    """A wrong dim must raise, never silently slice a prefix and
    return confidently wrong neighbors (self-review r8)."""
    import pytest as _pytest

    emb = _emb(spark)
    with _pytest.raises(Exception, match="dim=32"):
        qz.pq_train(emb, m=16, dim=32).collect()
    books = qz.pq_train(emb, train_mod=4)
    with _pytest.raises(Exception, match="dim=32"):
        qz.pq_encode(emb, books, m=8, dim=32).collect()
    with _pytest.raises(ValueError, match="not divisible"):
        qz.pq_train(emb, m=7, dim=64)
    # a NULL vector fires the same guard instead of silently encoding
    # as codeword 0 everywhere (NULLs-first argmin — self-review r8)
    nulled = emb.select(
        "vec_id",
        F.when(F.col("vec_id") == 3, None)
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    with _pytest.raises(Exception, match="NULL"):
        qz.pq_encode(nulled, books).collect()


def test_filtered_ann_recall_and_filter_semantics(spark):
    """knn_pq_lsh(candidate_filter=, refine=): the t82 contracts the
    gate can't see.  Ground truth is exact kNN over the FILTERED
    candidate set; the bucket-restricted recall floor (same 0.15
    contract as the unfiltered pin, n_planes=2) must survive
    filtering; no returned neighbor may violate the predicate; and
    every query still fills k rows — the under-fill that filtering
    AFTER ranking would cause is the bug this parameter prevents."""
    import pytest as _pytest

    emb = _emb(spark)
    pred = F.col("vec_id") % 5 == 2
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    exact = sim.knn_bruteforce(
        queries, emb.filter(pred), k=10
    ).localCheckpoint(eager=True)
    total = exact.count()
    books = qz.pq_train(emb, train_mod=2).localCheckpoint(eager=True)
    out = qz.knn_pq_lsh(
        queries, emb, books, k=10, n_planes=2,
        candidate_filter=pred, refine=100,
    ).localCheckpoint(eager=True)
    # predicate semantics: zero leaks, full k per query
    assert out.filter(~(F.col("neighbor_id") % 5 == 2)).count() == 0
    per_q = out.groupBy("query_id").count()
    assert per_q.filter(F.col("count") != 10).count() == 0
    # recall floor vs exact FILTERED ground truth
    hits = out.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "leftsemi",
    ).count()
    assert hits / total >= 0.15
    # the refined scores are EXACT cosines: agree on the intersection
    both = out.join(exact, ["query_id", "neighbor_id"]).select(
        (F.col("pq_cosine") == F.col("cosine_sim")).alias("same")
    )
    assert both.filter(~F.col("same")).count() == 0
    with _pytest.raises(ValueError, match="refine"):
        qz.knn_pq_lsh(
            queries, emb, books, k=10, candidate_filter=pred, refine=10
        )
