"""Property-based tests (hypothesis): the custom distributed operators —
as-of join, bucketized range join, connected components — against
brute-force serial references on randomized inputs.  The oracle gates
pin one dataset; these search the input space for edge cases (empty
sides, ties, singletons, dense overlaps).

Example counts are kept small: each example runs real Spark jobs, and
hypothesis shrinks on failure anyway.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_

from ecommerce_data_pipeline_23a91a05i4_spark.operators.asof import asof_join
from ecommerce_data_pipeline_23a91a05i4_spark.operators.graph import (
    connected_components,
)
from ecommerce_data_pipeline_23a91a05i4_spark.operators.rangejoin import range_join

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

keys = st_.integers(min_value=0, max_value=3)
times = st_.integers(min_value=0, max_value=50)


@settings(**SETTINGS)
@given(
    left=st_.lists(st_.tuples(keys, times), min_size=1, max_size=25),
    right=st_.lists(st_.tuples(keys, times), max_size=25, unique=True),
)
def test_asof_join_matches_serial_reference(spark, left, right):
    """asof value = value of the latest right row with r_t <= l_t (same
    key), else NULL.  Right (key, t) pairs are unique by construction —
    duplicate right timestamps per key have no defined winner."""
    right = list({(k, t) for k, t in right})  # unique per (key, time)
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in right] or [(99, 99, 0)],
        "k long, rt long, v long",
    )
    if not right:
        rdf = rdf.filter("k < 0")  # truly empty right side
    out = {
        r.lid: r.v
        for r in asof_join(ldf, rdf, "k", "t", "rt", ["v"]).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, k * 1000 + rt) for (rk, rt) in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert out[i] == want, (i, k, t, out[i], want)


@settings(**SETTINGS)
@given(
    points=st_.lists(st_.tuples(keys, times), min_size=1, max_size=20),
    ivals=st_.lists(st_.tuples(keys, times, times), max_size=15),
)
def test_range_join_matches_serial_reference(spark, points, ivals):
    """One output row per (point, containing interval); containment is
    inclusive on both ends; bucketization must not lose boundary hits."""
    base = dt.datetime(2024, 1, 1)
    ts = lambda m: base + dt.timedelta(minutes=int(m))  # noqa: E731
    ivals = [(k, min(s, e), max(s, e)) for k, s, e in ivals]
    pdf = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(points)],
        "pid long, k long, t timestamp",
    )
    idf = spark.createDataFrame(
        [(j, k, ts(s), ts(e)) for j, (k, s, e) in enumerate(ivals)]
        or [(0, 99, base, base)],
        "iid long, k long, s timestamp, e timestamp",
    )
    if not ivals:
        idf = idf.filter("k < 0")
    # bucket width much smaller than the value range exercises multi-bucket
    # interval explosion; boundary cases exercise the dedup
    got = {
        (r.pid, r.iid)
        for r in range_join(pdf, idf, "k", "t", "s", "e", bucket_width_s=300).collect()
    }
    want = {
        (i, j)
        for i, (pk, pt) in enumerate(points)
        for j, (ik, s, e) in enumerate(ivals)
        if pk == ik and s <= pt <= e
    }
    assert got == want


@settings(**SETTINGS)
@given(
    edges=st_.lists(
        st_.tuples(
            st_.integers(min_value=0, max_value=12),
            st_.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    parent = list(range(13))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)

    nodes = {n for e in edges for n in e}
    want = {}
    for n in nodes:
        root = find(n)
        want[n] = min(m for m in nodes if find(m) == root)

    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(edf).collect()}
    assert got == want


@settings(**SETTINGS)
@given(
    texts=st_.lists(
        st_.text(
            alphabet="ab cd",  # tiny alphabet with spaces: forces shingle
            min_size=0,        # collisions, empty docs, repeated tokens
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_rowwise_bands_equal_grouped_bands(spark, texts):
    """The stateless per-row MinHash banding (streaming path, s3) must
    produce EXACTLY the grouped signatures' band keys for any text —
    the equivalence the stream-static index join relies on."""
    from pyspark.sql import functions as F

    from ecommerce_data_pipeline_23a91a05i4_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    grouped = {
        (r.id, r.band, r.bkey)
        for r in dd.md5_band_table(
            dd.minhash_md5_signatures(dd.shingle_table(df, "doc_id", "text", n=2))
        ).collect()
    }
    rowwise = {
        (r.doc_id, r.bk.band, r.bk.bkey)
        for r in df.select(
            "doc_id",
            F.explode(
                dd.rowwise_md5_bands(dd.shingle_array(F.col("text")))
            ).alias("bk"),
        ).collect()
    }
    assert rowwise == grouped
