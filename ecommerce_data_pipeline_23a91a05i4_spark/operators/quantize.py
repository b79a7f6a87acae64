"""Scalar (int8) embedding quantization — the memory/IO lever for
similarity search at the 100 TB target.

An embedding corpus is the widest column in a training-data lakehouse:
10⁹ × 64-dim float64 vectors are ~0.5 TB of doubles that every dedup /
kNN pass must shuffle or cache.  Symmetric per-vector int8 quantization
(the FAISS ``SQ8`` / IVF-SQ discipline) stores each element in ONE byte
plus one double scale per vector — 8× smaller at 64 dims — and, because
cosine is scale-invariant, similarity over the quantized vectors needs
NO dequantization: ``cos(q_a, q_b)`` over the raw int codes directly
approximates ``cos(a, b)`` (per-vector scales cancel).  Everything here
is built-in column expressions (transform/aggregate folds) — zero UDFs,
fully codegen'd, and replayable in ANSI SQL, which is how the t65
oracle proves the whole pipeline cross-engine.

Determinism contract (the repo-wide cross-engine discipline):

- the per-vector max-|x| fold is order-independent (max), so the scale
  is identical under any partitioning and in DuckDB;
- the code is ``floor(x / scale + 0.5)`` — explicit round-half-up,
  identical in Spark and every SQL engine, instead of engine-native
  ``round`` whose half-even/half-up behavior diverges (the F15
  pothole);
- quantized dots multiply INTEGRAL doubles ≤ 127·127·dim — exact in
  IEEE, so ranks match bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import quant
from .similarity import cosine

#: symmetric int8 code range: [-QUANT_LEVELS, QUANT_LEVELS] fits tinyint
QUANT_LEVELS = 127

#: product-quantization defaults: 64 dims → 16 sub-spaces of 4 dims,
#: 16 codewords each = 4 bits/code, 8 bytes/vector — ~32× smaller than
#: the float64 corpus (SQ8's 8× is the floor; PQ is what makes
#: billion-vector corpora cache-resident)
PQ_M = 16
PQ_KSUB = 16
PQ_ITERS = 1


def max_abs(vec: Column) -> Column:
    """Order-independent max-|x| fold (the per-vector scale basis)."""
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = QUANT_LEVELS,
) -> DataFrame:
    """(id, scale double, qvec array<tinyint>): symmetric per-vector
    linear quantization.  ``x ≈ code · scale`` with ``scale =
    max|x|/levels``; the max element maps to ±levels exactly, an
    all-zero vector gets scale 0 and an all-zero code (the CASE guard —
    never a NaN division).  Map-side only: no shuffle, no UDF, no
    driver state; reconstruction error is ≤ scale/2 per element
    (pinned by test)."""
    scale = (max_abs(F.col(vec_col)) / F.lit(float(levels))).alias("scale")
    out = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), scale)
    code = F.when(
        F.col("scale") == 0.0,
        F.transform(F.col("vec"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("vec"),
            # round-half-up via floor(v + 0.5): cross-engine-identical
            lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)),
        )
    )
    return out.select(
        F.col("id").alias(id_col),
        "scale",
        code.cast("array<tinyint>").alias("qvec"),
    )


def dequantize(qvec: Column, scale: Column) -> Column:
    """array<double> reconstruction: ``code · scale`` per element."""
    return F.transform(qvec, lambda c: c.cast("double") * scale)


def knn_lsh_quantized(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
    levels: int = QUANT_LEVELS,
) -> DataFrame:
    """ANN over the QUANTIZED corpus — the bucketed composition (the
    FAISS IVF-SQ discipline: a coarse partitioner in front of one-byte
    codes): SRP-bucket BOTH sides, join on bucket equality, rank by
    int8-code cosine.  The signature is computed FROM THE CODES, so at
    query time the store needs no float vectors at all — the scan,
    shuffle, and cache footprint is the int8 corpus plus one long per
    vector, and the per-query candidate set is a bucket, not the
    corpus (the brute-force crossJoin term knn_quantized still pays).
    Same deterministic SRP hyperplanes as similarity.knn_lsh (shared
    seed/source of truth), same fold order both engines replay, so the
    t69 oracle reproduces buckets AND ranks bit-for-bit.  Recall is
    tuned by n_planes (fewer bits → bigger buckets → higher recall,
    more compute); code quantization adds only sign-flips within
    numerical noise of the hyperplane boundary on top of knn_lsh."""
    from .similarity import _hyperplanes, lsh_signature, rank_topk

    planes = _hyperplanes(dim, n_planes)
    q = quantize_embeddings(queries, id_col, vec_col, levels).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_vec"),
        lsh_signature(F.col("qvec"), planes).alias("bucket"),
    )
    c = quantize_embeddings(candidates, id_col, vec_col, levels).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("c_vec"),
        lsh_signature(F.col("qvec"), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            quant(cosine(F.col("q_vec"), F.col("c_vec")), ndigits).alias(
                "qcosine_sim"
            ),
        )
    )
    return rank_topk(scored, k, "qcosine_sim")


def knn_quantized(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
    levels: int = QUANT_LEVELS,
) -> DataFrame:
    """Exact top-k over the QUANTIZED corpus: (query_id, neighbor_id,
    rank, qcosine_sim).  Same shape as similarity.knn_bruteforce —
    broadcast queries, per-query window, id tie-break — but every
    cosine reads int8 codes instead of float64 vectors: the scan,
    shuffle, and cache footprint of the corpus side drops ~8× at 64
    dims, which is the term that dominates brute-force kNN cost at
    scale.  Scales cancel in cosine, so no dequantization happens in
    the hot path.  Both sides quantized (asymmetric float-query
    variants trade a little accuracy back; symmetric is what the
    oracle can replay exactly)."""
    q = quantize_embeddings(queries, id_col, vec_col, levels).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_vec")
    )
    c = quantize_embeddings(candidates, id_col, vec_col, levels).select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("c_vec")
    )
    from .similarity import rank_topk

    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            quant(cosine(F.col("q_vec"), F.col("c_vec")), ndigits).alias(
                "qcosine_sim"
            ),
        )
    )
    return rank_topk(scored, k, "qcosine_sim")


# ------------------------------------------------ product quantization

def _l2sq(a: Column, b: Column) -> Column:
    """Sequential left-fold squared L2 distance (the dot() fold
    discipline: term order is the element order, initial 0.0 — IEEE-
    identical in any engine that folds left, which is how the t80
    oracle replays the whole k-means)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, dim: int
) -> DataFrame:
    """(id, sub, svec): each vector split into ``m`` contiguous
    sub-vectors of dim/m elements — one explode, no UDF.  An in-plan
    guard (the shared exprs.plan_guard idiom) raises when a vector's
    ACTUAL length differs from ``dim`` — without it a wrong dim would
    silently slice a prefix and every downstream rank would be
    confidently wrong (self-review r8).  A NULL vector fires the same
    guard (size(NULL) is NULL; coalesced to -1): left through, it
    would encode as codeword 0 in every sub-space — NULLs-first argmin
    — and rank as if it were the cluster-0 reconstruction."""
    from ..functions.exprs import plan_guard

    dsub = dim // m
    bad = plan_guard(
        F.coalesce(F.size(F.col("vec")), F.lit(-1)) != dim,
        F.lit("pq: vector of length "),
        F.coalesce(F.size(F.col("vec")).cast("string"), F.lit("NULL")),
        F.lit(f" but the operator was called with dim={dim}"),
    ).cast("int")
    # the guard rides the SEQUENCE BOUND, not the slice start: slice()
    # is null-intolerant and short-circuits on a NULL vector without
    # evaluating its start argument, which would let NULL vectors sail
    # through; sequence's bounds always evaluate
    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .select(
            "id",
            F.explode(
                F.sequence(
                    F.lit(0), F.lit(m - 1) + F.coalesce(bad, F.lit(0))
                )
            ).alias("sub"),
            F.col("vec"),
        )
        .select(
            "id",
            "sub",
            F.slice(
                F.col("vec"), F.col("sub") * dsub + 1, F.lit(dsub)
            ).alias("svec"),
        )
    )


def _pq_assign(sv: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Per (id, sub): the L2-nearest codeword — (id, sub, code[, svec]).
    The ONE home of the PQ argmin tie-break (l2 ASC, code ASC), shared
    by training and encoding so they cannot drift.  The codebook side
    is m × ksub rows — broadcast by construction; the per-(id, sub)
    window spans ksub rows, bounded whatever the corpus size."""
    scored = sv.join(F.broadcast(codebooks), "sub").select(
        "id",
        "sub",
        "svec",
        F.col("cluster_id").alias("code"),
        _l2sq(F.col("svec"), F.col("centroid")).alias("d2"),
    )
    w = Window.partitionBy("id", "sub").orderBy(
        F.asc("d2"), F.asc("code")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "sub", "code", "svec")
    )


def pq_train(
    vectors: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_mod: int | None = None,
) -> DataFrame:
    """Train ``m`` product-quantization codebooks (Jégou, Douze,
    Schmid 2011 — the published PQ design behind FAISS's IVFPQ): the
    vector space is split into m sub-spaces and each gets its own
    ksub-codeword L2 k-means codebook, so a vector encodes into m
    small codes (log2(ksub) bits each) and distances are answered from
    per-sub lookup tables without ever touching floats (knn_pq).

    ALL m codebooks train in ONE DataFrame flow — no per-sub-space
    driver loop: sub-vectors are one explode, seeding is one bounded
    window over the md5-hash-sampled candidates (the _seed_centroids
    discipline — the same ~SEED_OVERSAMPLE·ksub sampled ids seed every
    sub-space, so the window partition is ≤ that many rows whatever
    N), each k-means pass is one broadcast join + one bounded window +
    one decimal-exact grouped mean (the ivf_train update discipline:
    exact SUM, one cast, one IEEE division — SQL-replayable), and
    empty codewords carry over via left join + coalesce.

    ``train_mod``: md5-modulus sampled training (ivf_train(train_mod=)
    — every pass costs O(N/train_mod); encode the full corpus against
    the trained books afterwards).  Returns (sub int, cluster_id int,
    centroid array<double>)."""
    from .similarity import SEED_OVERSAMPLE, _seed_hkey

    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    if train_mod is not None and int(train_mod) > 1:
        v = v.filter(_seed_hkey(F.col("id")) % int(train_mod) == 0)
    n = v.count()
    if n == 0:
        raise ValueError(
            "pq_train: empty training set — lower train_mod or train "
            "unsampled"
        )
    # (id, sub, svec) materialized once: reused by the seed stage and
    # every training pass (the ivf_train cache-the-training-set rule)
    sv = _subvectors(v, "id", "vec", m, dim).withColumn(
        "hkey", _seed_hkey(F.col("id"))
    ).localCheckpoint()
    mod = max(1, n // (SEED_OVERSAMPLE * ksub))
    cand = sv.filter(F.col("hkey") % mod == 0)
    if mod > 1 and cand.select("id").distinct().limit(ksub).count() < ksub:
        cand = sv  # deterministic short-sample fallback
    w = Window.partitionBy("sub").orderBy("hkey", "id")
    cents = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= ksub)
        .select(
            "sub",
            (F.col("_rn") - 1).cast("int").alias("cluster_id"),
            F.col("svec").cast("array<double>").alias("centroid"),
        )
        .localCheckpoint()
    )
    dsub = dim // m
    for _ in range(iters):
        assigned = _pq_assign(sv.select("id", "sub", "svec"), cents)
        upd = (
            assigned.select(
                "sub",
                F.col("code").alias("cluster_id"),
                F.posexplode("svec").alias("d", "val"),
            )
            .groupBy("sub", "cluster_id", "d")
            # decimal-exact SUM, one cast, one IEEE division — the
            # ivf_train cross-engine mean discipline
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(28,12)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                ).alias("mval")
            )
            .groupBy("sub", "cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "mval"))),
                    lambda s: s.mval,
                ).alias("c_new")
            )
        )
        cents = (
            cents.join(upd, ["sub", "cluster_id"], "left")
            .select(
                "sub",
                "cluster_id",
                F.coalesce(F.col("c_new"), F.col("centroid")).alias(
                    "centroid"
                ),
            )
            .localCheckpoint()
        )
    return cents


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector's m nearest-codeword ids in
    sub-space order — the 100 TB storage form (log2(ksub)·m bits per
    vector; 8 bytes at the defaults vs 512 for float64, the ~32×
    cache-residency lever).  Pure argmin through _pq_assign, so the
    t80 oracle replays encoding verbatim."""
    sv = _subvectors(vectors, id_col, vec_col, m, dim)
    return (
        _pq_assign(sv, codebooks)
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s.code,
            ).alias("codes")
        )
        .select(F.col("id").alias(id_col), "codes")
    )


def knn_pq(
    queries: DataFrame,
    candidates: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    m: int = PQ_M,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
    refine: int | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-encoded corpus:
    (query_id, neighbor_id, rank, pq_cosine).  The published IVFADC
    query shape: each query precomputes ONE m × ksub lookup table
    (dot(q_sub, codeword) per cell, plus the codeword self-dots for
    the reconstruction norm), and every candidate is scored by m table
    lookups over its codes — the corpus side reads CODES ONLY, never a
    float vector, so the scan+shuffle term is the 8-byte-per-vector
    relation.  pq_cosine = table-summed dot(q, x̂) / (|q| · |x̂|) with
    x̂ the codeword reconstruction — both folds run in fixed sub-space
    order (zip_with + left fold), every op a single IEEE op, so the
    oracle replays ranks bit-for-bit.  A degenerate all-zero
    reconstruction scores 0.0 instead of raising under ANSI.

    ``refine``: the published shortlist-then-refine composition
    (FAISS's IVFADC+R): the ADC pass keeps the top ``refine``
    candidates per query, then EXACT cosine re-ranks just those to the
    final top-k (``pq_cosine`` is then the exact cosine).  Float
    vectors are fetched for queries × refine rows only — a fixed
    per-query cost however large the corpus, while recall@k rises to
    the shortlist's containment rate (codes alone plateau on weakly
    clustered data: 4-bit cells are coarser than the true top-k gaps).
    ``refine`` must exceed ``k``.

    ``codes``: a PRE-ENCODED (id, codes) relation (pq_encode output,
    e.g. persisted in a TxTable) — the production entry point: with
    codes supplied and ``refine=None``, the candidate side's float
    vectors are never read at all (pinned by test); with refine, they
    are read only for the shortlist join."""
    enc = (
        codes.select(F.col(id_col), "codes")
        if codes is not None
        else pq_encode(candidates, codebooks, m, dim, id_col, vec_col)
    )
    qs = _subvectors(queries, id_col, vec_col, m, dim)
    from .similarity import dot, l2_norm, rank_topk

    dt = qs.join(F.broadcast(codebooks), "sub").select(
        F.col("id").alias("query_id"),
        "sub",
        F.col("cluster_id").alias("code"),
        dot(F.col("svec"), F.col("centroid")).alias("pdot"),
        dot(F.col("centroid"), F.col("centroid")).alias("pcc"),
    )
    # the per-query ADC table: tabs[sub+1][code+1] = dot(q_sub, c)
    tabs = (
        dt.groupBy("query_id", "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "pdot"))),
                lambda s: s.pdot,
            ).alias("pd"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "pcc"))),
                lambda s: s.pcc,
            ).alias("pc"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "pd"))),
                lambda s: s.pd,
            ).alias("tabs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "pc"))),
                lambda s: s.pc,
            ).alias("ctabs"),
        )
    )
    qn = queries.select(
        F.col(id_col).alias("query_id"),
        l2_norm(F.col(vec_col)).alias("qnrm"),
    )
    tabs = tabs.join(qn, "query_id")

    def fold_lookup(tab_col: str) -> Column:
        # fixed sub-space order: zip the m tables with the m codes,
        # look each cell up, left-fold — the deterministic ADC sum
        return F.aggregate(
            F.zip_with(
                F.col(tab_col),
                F.col("codes"),
                lambda t, c: F.element_at(t, c + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    adc_dot = fold_lookup("tabs")
    rnrm2 = fold_lookup("ctabs")
    denom = F.col("qnrm") * F.sqrt(rnrm2)
    scored = (
        enc.crossJoin(F.broadcast(tabs))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            quant(
                F.when(denom == 0.0, F.lit(0.0)).otherwise(
                    adc_dot / denom
                ),
                ndigits,
            ).alias("pq_cosine"),
        )
    )
    if refine is None:
        return rank_topk(scored, k, "pq_cosine")
    if refine <= k:
        raise ValueError(
            f"knn_pq: refine ({refine}) must exceed k ({k}) — the "
            "shortlist is what the exact pass re-ranks"
        )
    shortlist = rank_topk(scored, refine, "pq_cosine").select(
        "query_id", "neighbor_id"
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cv = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    refined = (
        shortlist.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            quant(cosine(F.col("q_vec"), F.col("c_vec")), ndigits).alias(
                "pq_cosine"
            ),
        )
    )
    return rank_topk(refined, k, "pq_cosine")


def knn_pq_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    m: int = PQ_M,
    dim: int = 64,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
    candidate_filter: Column | str | None = None,
    refine: int | None = None,
) -> DataFrame:
    """PQ composed with the SRP coarse partitioner (the t69
    IVF-in-front-of-codes discipline, codes now 4-bit PQ instead of
    int8): candidates bucket by the SRP signature of their CODEWORD
    RECONSTRUCTION — a pure function of the stored codes, so the
    store still holds no floats — queries by their float vector, join
    on bucket equality, rank by reconstruction cosine (mathematically
    the ADC score: table-fold and full-vector dot agree by linearity).
    Per-query work is a bucket, not the corpus; recall tuning is
    n_planes as in knn_lsh (same shared hyperplanes).

    ``candidate_filter`` (VERDICT r8 ask #4) is the retrieval-filter
    pushdown: a predicate over the candidate relation's columns
    (Column or SQL string) applied BEFORE encoding and bucketing, so
    non-matching vectors are pruned at the scan — Catalyst pushes it
    below the bucket join (plan-asserted) — and per-query work shrinks
    to the matching members of one bucket.  Filtering AFTER ranking
    would silently return < k rows whenever matches rank past k — the
    classic filtered-ANN bug this parameter exists to prevent.  With a
    persisted codes table, apply the same predicate to the metadata
    relation and semi-join the codes instead; the bucket/rank stages
    are unchanged.

    ``refine``: exact-cosine re-rank of the top-``refine`` bucket
    shortlist (the knn_pq shortlist-then-refine contract): float
    vectors are fetched for the FILTERED shortlist rows only, and
    recall@k under filtering rises to the shortlist's containment rate
    (pinned in test_quantize)."""
    from .similarity import (
        _hyperplanes,
        cosine,
        dot,
        l2_norm,
        lsh_signature,
        rank_topk,
    )

    if candidate_filter is not None:
        candidates = candidates.filter(candidate_filter)
    planes = _hyperplanes(dim, n_planes)
    enc = pq_encode(candidates, codebooks, m, dim, id_col, vec_col)
    recon = (
        enc.select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode("codes").alias("sub", "code"),
        )
        .join(
            F.broadcast(
                codebooks.select(
                    "sub", F.col("cluster_id").alias("code"), "centroid"
                )
            ),
            ["sub", "code"],
        )
        .groupBy("neighbor_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "centroid"))),
                    lambda s: s.centroid,
                )
            ).alias("rvec")
        )
    )
    c = recon.select(
        "neighbor_id",
        "rvec",
        lsh_signature(F.col("rvec"), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    denom = l2_norm(F.col("q_vec")) * l2_norm(F.col("rvec"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            quant(
                F.when(denom == 0.0, F.lit(0.0)).otherwise(
                    dot(F.col("q_vec"), F.col("rvec")) / denom
                ),
                ndigits,
            ).alias("pq_cosine"),
        )
    )
    if refine is None:
        return rank_topk(scored, k, "pq_cosine")
    if refine <= k:
        raise ValueError(
            f"knn_pq_lsh: refine ({refine}) must exceed k ({k}) — the "
            "shortlist is what the exact pass re-ranks"
        )
    shortlist = rank_topk(scored, refine, "pq_cosine").select(
        "query_id", "neighbor_id"
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cv = candidates.select(  # already filtered: the shortlist is too
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    refined = (
        shortlist.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            quant(cosine(F.col("q_vec"), F.col("c_vec")), ndigits).alias(
                "pq_cosine"
            ),
        )
    )
    return rank_topk(refined, k, "pq_cosine")
