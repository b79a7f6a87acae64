"""Similarity search over embedding columns (array<float>).

Two paths, both UDF-free (pure column expressions → whole-stage codegen):

- Brute-force cosine top-k: broadcast the (small) query set against the
  candidate corpus — a single scan over candidates, no shuffle besides the
  final per-query top-k.  This is the *correct* baseline at any scale where
  queries are few: O(|Q|·N) flops streamed through codegen.

- LSH-bucketed (random hyperplane / signed random projection): each vector
  gets a b-bit signature from the signs of projections onto deterministic
  pseudo-random hyperplanes; candidates share a bucket, then exact cosine
  re-ranks.  Turns O(N²) all-pairs (or O(|Q|·N) with huge Q) into
  bucket-local work.  Hyperplane coefficients are derived from a seeded
  PRNG at *plan construction* (they are literals in the plan — identical
  on every executor, run, and cluster size).

Cross-engine determinism (for the DuckDB oracle): dot products fold
left-to-right over double-cast elements — Spark F.aggregate and DuckDB
list_reduce both fold sequentially, and IEEE addition is deterministic for
a fixed order.  Final cosines are floor-quantized (functions/exprs.py).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import quant


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over double-cast elements."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine_sim).

    The query side is broadcast; rank is a per-query window on the
    quantized cosine with id tie-break (deterministic across engines).

    NOTE: self-match exclusion compares ids, so queries must be drawn
    from the candidate corpus (or use a disjoint id space) — with two
    corpora sharing an id space, a same-id candidate would be wrongly
    excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            quant(cosine(F.col("q_vec"), F.col("c_vec")), ndigits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (literals in the plan)."""
    rng = random.Random(seed)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection signature: bit p = sign(vec · plane_p)."""
    sig = F.lit(0).cast("long")
    for p, coeffs in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(c) for c in coeffs]))
        sig = sig.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def knn_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine re-rank.  At 100 TB the bucket join replaces the full
    scan; recall is tuned by n_planes (fewer bits → bigger buckets)."""
    planes = _hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            quant(cosine(F.col("q_vec"), F.col("c_vec")), ndigits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding-level near-dedup).

    All-pairs is O(N²) — correct at corpus sizes where N² fits (or after
    LSH pre-blocking); the scale path is knn_lsh-style bucketing first.
    """
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            quant(cosine(F.col("v_a"), F.col("v_b")), ndigits).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


# ------------------------------------------------------------ IVF scale path

def ivf_train(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train an IVF coarse quantizer: mini k-means with deterministic
    seeding (the k lowest-id vectors) and a fixed iteration count.

    Centroids are collected to the driver between iterations — they are
    k·dim doubles (a few KB), the same size class as the LSH hyperplane
    literals; the assignment/update passes stay fully distributed
    (posexplode → groupBy(cluster, dim) → rebuild).

    Returns a DataFrame (cluster_id int, centroid array<double>).
    """
    spark = vectors.sparkSession
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    seeds = v.orderBy("id").limit(k).collect()
    centroids = [
        (i, [float(x) for x in r.vec]) for i, r in enumerate(seeds)
    ]
    for _ in range(iters):
        cdf = spark.createDataFrame(
            centroids, "cluster_id int, centroid array<double>"
        )
        assigned = _assign_clusters(v, cdf)
        upd = (
            assigned.join(v, "id")
            .select("cluster_id", F.posexplode("vec").alias("dim", "val"))
            .groupBy("cluster_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s.m,
                ).alias("centroid")
            )
        )
        new = {r.cluster_id: [float(x) for x in r.centroid] for r in upd.collect()}
        # empty clusters keep their previous centroid
        centroids = [(cid, new.get(cid, c)) for cid, c in centroids]
    return spark.createDataFrame(centroids, "cluster_id int, centroid array<double>")


def _assign_clusters(v: DataFrame, centroids: DataFrame, n: int = 1) -> DataFrame:
    """Nearest-centroid assignment by cosine; n>1 keeps the n best
    (multi-probe).  Returns (id, cluster_id[, probe_rank])."""
    scored = v.crossJoin(F.broadcast(centroids)).select(
        "id",
        "cluster_id",
        cosine(F.col("vec"), F.col("centroid")).alias("sim"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("cluster_id"))
    ranked = scored.withColumn("probe_rank", F.row_number().over(w)).filter(
        F.col("probe_rank") <= n
    )
    return ranked.select("id", "cluster_id", "probe_rank")


def knn_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Approximate top-k via the IVF index: candidates are restricted to
    the query's nprobe nearest clusters, then exact cosine re-ranks.

    At 100 TB: the candidate side is pre-assigned once (a stored column,
    ideally the partition key), so a query touches nprobe/k of the corpus
    — the standard recall/throughput dial.
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("q_vec"))
    c = candidates.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("c_vec"))
    q_assign = _assign_clusters(
        q.select(F.col("qid").alias("id"), F.col("q_vec").alias("vec")),
        centroids,
        n=nprobe,
    ).select(F.col("id").alias("qid"), "cluster_id")
    c_assign = _assign_clusters(
        c.select(F.col("cid").alias("id"), F.col("c_vec").alias("vec")), centroids
    ).select(F.col("id").alias("cid"), "cluster_id")
    pairs = (
        q_assign.join(c_assign, "cluster_id")
        .select("qid", "cid")
        .distinct()
        .filter(F.col("qid") != F.col("cid"))
    )
    scored = (
        pairs.join(q, "qid")
        .join(c, "cid")
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            quant(cosine(F.col("q_vec"), F.col("c_vec")), ndigits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
