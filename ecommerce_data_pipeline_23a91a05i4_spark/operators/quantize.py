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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import quant
from .similarity import cosine

#: symmetric int8 code range: [-QUANT_LEVELS, QUANT_LEVELS] fits tinyint
QUANT_LEVELS = 127


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
