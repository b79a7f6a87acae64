"""Similarity-search operators: exact math on known vectors, LSH recall."""

from __future__ import annotations

import math

from ecommerce_data_pipeline_23a91a05i4_spark.operators import similarity as sim


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # close to 1
        (3, [0.0, 1.0, 0.0]),   # orthogonal to 1
        (4, [-1.0, 0.0, 0.0]),  # opposite of 1
        (5, [1.0, 0.0, 0.0]),   # identical to 1
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_knn_bruteforce_ordering(spark):
    vecs = _vecs(spark)
    out = sim.knn_bruteforce(vecs.filter("vec_id = 1"), vecs, k=4)
    rows = out.orderBy("rank").collect()
    assert [r.neighbor_id for r in rows] == [5, 2, 3, 4]
    assert rows[0].cosine_sim == 1.0
    expected = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(rows[1].cosine_sim - expected) < 1e-6
    assert rows[2].cosine_sim == 0.0
    assert rows[3].cosine_sim == -1.0


def test_neardup_pairs_threshold(spark):
    vecs = _vecs(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in sim.embedding_neardup_pairs(vecs, threshold=0.95).collect()
    }
    assert (1, 5) in pairs
    assert (1, 2) in pairs  # cos ≈ 0.9939
    assert (1, 3) not in pairs and (1, 4) not in pairs


def test_lsh_identical_vectors_share_bucket(spark):
    vecs = _vecs(spark)
    out = sim.knn_lsh(vecs.filter("vec_id = 1"), vecs, k=4, dim=3, n_planes=6)
    rows = out.orderBy("rank").collect()
    # identical vector always lands in the same bucket → always recalled
    assert rows[0].neighbor_id == 5 and rows[0].cosine_sim == 1.0
    # opposite vector can never share a sign bucket
    assert all(r.neighbor_id != 4 for r in rows)
