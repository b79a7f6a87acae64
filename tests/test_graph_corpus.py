"""Connected components + corpus-curation gates (t20-t22, q30-q34 helpers).

The oracle gates prove cross-engine value parity; these tests pin the
*semantics* on constructed inputs where the right answer is known by
hand — transitive closure shapes, funnel ordering, sampling balance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_data_pipeline_23a91a05i4_spark.operators.graph import (
    connected_components,
)
from ecommerce_data_pipeline_23a91a05i4_spark.plans import behavioral, corpus

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _components(spark, pairs):
    out = connected_components(_edges(spark, pairs)).collect()
    comp: dict[int, set[int]] = {}
    for r in out:
        comp.setdefault(r.component, set()).add(r.node)
    return set(frozenset(s) for s in comp.values()), {
        r.node: r.component for r in out
    }


def test_cc_chain_closes_transitively(spark):
    """A-B, B-C, C-D: one component labeled by the min node, even though
    A and D share no edge."""
    groups, labels = _components(spark, [(1, 2), (2, 3), (3, 4)])
    assert groups == {frozenset({1, 2, 3, 4})}
    assert set(labels.values()) == {1}


def test_cc_separate_components_stay_separate(spark):
    groups, labels = _components(
        spark, [(10, 11), (20, 21), (21, 22), (30, 30)]
    )
    assert groups == {
        frozenset({10, 11}),
        frozenset({20, 21, 22}),
        frozenset({30}),
    }
    assert labels[22] == 20


def test_cc_long_chain_converges(spark):
    """A 40-node path graph needs ~log-to-diameter rounds of propagation;
    the loop's convergence test must carry min labels the whole way."""
    n = 40
    groups, labels = _components(spark, [(i, i + 1) for i in range(n)])
    assert groups == {frozenset(range(n + 1))}
    assert labels[n] == 0


def test_cc_reliable_checkpoint_converges(spark, tmp_path):
    """checkpoint_dir switches the per-round lineage truncation from
    localCheckpoint to reliable checkpoint() (cluster-durable: survives
    executor loss).  Same answers, and checkpoint files actually land in
    the directory."""
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)]
    ckpt = str(tmp_path / "cc_ckpt")
    out = connected_components(
        _edges(spark, pairs), checkpoint_dir=ckpt
    ).collect()
    comp: dict[int, set[int]] = {}
    for r in out:
        comp.setdefault(r.component, set()).add(r.node)
    assert set(frozenset(s) for s in comp.values()) == {
        frozenset({1, 2, 3, 4}),
        frozenset({10, 11}),
        frozenset({20}),
    }
    import pathlib

    assert any(pathlib.Path(ckpt).rglob("*")), "no reliable checkpoint files written"


def test_cc_checkpoint_dir_restored_even_on_error(spark, tmp_path):
    """setCheckpointDir is SparkContext-global; the operator must restore
    the prior dir via try/finally even when the iteration raises (here:
    the edge frame lacks the named src column)."""
    import pytest

    prior = str(tmp_path / "prior_ckpt")
    spark.sparkContext.setCheckpointDir(prior)
    bad = spark.createDataFrame([(1, 2)], "x long, dst long")
    with pytest.raises(Exception):
        connected_components(bad, checkpoint_dir=str(tmp_path / "job_ckpt"))
    opt = spark.sparkContext._jsc.sc().getCheckpointDir()
    assert opt.isDefined() and prior in opt.get()


def test_cc_edge_direction_irrelevant(spark):
    g1, _ = _components(spark, [(5, 1), (1, 9)])
    g2, _ = _components(spark, [(1, 5), (9, 1)])
    assert g1 == g2 == {frozenset({1, 5, 9})}


def test_neardup_clusters_cover_all_paired_docs(spark):
    """Every doc that appears in a t5 jaccard pair must land in exactly
    one cluster, labeled by its cluster's min doc_id, and cluster_size
    must equal the member count."""
    from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table
    from ecommerce_data_pipeline_23a91a05i4_spark.operators import dedup as dd
    from ecommerce_data_pipeline_23a91a05i4_spark.plans.llmdata import (
        JACCARD_MAX_DOC_FREQ,
        JACCARD_THRESHOLD,
    )

    docs = table(spark, SF, "documents")
    pairs = dd.jaccard_pairs(
        dd.shingle_table(docs, "doc_id", "text", n=2),
        threshold=JACCARD_THRESHOLD,
        max_doc_freq=JACCARD_MAX_DOC_FREQ,
    ).collect()
    clusters = corpus.t21_neardup_clusters(spark, SF).collect()

    paired = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert {r.doc_id for r in clusters} == paired
    by_comp: dict[int, list] = {}
    for r in clusters:
        by_comp.setdefault(r.component, []).append(r)
    for comp_id, members in by_comp.items():
        assert comp_id == min(m.doc_id for m in members)
        assert all(m.cluster_size == len(members) for m in members)
    # each pair's endpoints must share a component (transitive closure)
    label = {r.doc_id: r.component for r in clusters}
    for p in pairs:
        assert label[p.id_a] == label[p.id_b]


def test_tfidf_ranks_rare_terms_over_common(spark):
    """A term unique to one doc must outrank a corpus-wide term within
    that doc at equal tf."""
    rows = [
        (1, "zebra common common"),
        (2, "common common apple"),
        (3, "common banana banana"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").count()
    n_docs = docs.count()
    scored = (
        tf.join(tf.groupBy("term").count().withColumnRenamed("count", "df"), "term")
        .select(
            "doc_id",
            "term",
            (
                (F.col("count") * (F.lit(n_docs) + 1)).cast("double")
                / (F.col("df") + 1).cast("double")
            ).alias("s"),
        )
    )
    d3 = {r.term: r.s for r in scored.filter("doc_id = 3").collect()}
    assert d3["banana"] > d3["common"]


def test_tfidf_gate_topk_shape(spark):
    out = corpus.t20_tfidf_top_terms(spark, SF)
    rows = out.collect()
    assert rows, "empty tfidf output"
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.term_rank)
    for ranks in per_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= corpus.TFIDF_TOP_K


def test_balanced_sample_caps_each_stratum(spark):
    """Expected kept count per language is min(stratum, ~target); the
    hash-uniform keeps it within binomial noise, and re-running is
    byte-identical (determinism)."""
    out = corpus.t22_balanced_language_sample(spark, SF)
    a = [tuple(r) for r in out.collect()]
    b = [tuple(r) for r in out.collect()]
    assert a == b
    kept = out.groupBy("lang").count().collect()
    sizes = {
        r.lang: r.stratum_size
        for r in out.select("lang", "stratum_size").distinct().collect()
    }
    for r in kept:
        n, kept_n = sizes[r.lang], r["count"]
        expect = min(n, corpus.SAMPLE_TARGET_PER_STRATUM)
        # 4-sigma binomial tolerance around the target rate
        p = min(1.0, corpus.SAMPLE_TARGET_PER_STRATUM / n)
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(kept_n - expect) <= 4 * sigma + 1


def test_sliding_chunks_cover_and_overlap(spark):
    """Chunk invariants on the real corpus: chunk 0 starts at token 0,
    consecutive chunks advance by exactly the stride, every chunk except
    possibly the last is full-size, and the union of chunks covers every
    token of the document."""
    from ecommerce_data_pipeline_23a91a05i4_spark.catalog import table
    from ecommerce_data_pipeline_23a91a05i4_spark.operators import text as tx

    out = corpus.t35_sliding_chunks(spark, SF).collect()
    docs = {
        r.doc_id: r.nt
        for r in table(spark, SF, "documents")
        .select("doc_id", tx.token_count(F.col("text")).alias("nt"))
        .collect()
    }
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(docs)
    C, S = corpus.CHUNK_TOKENS, corpus.CHUNK_STRIDE
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        nt = docs[doc_id]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        want_n = 1 if nt <= C else 1 + -(-(nt - C) // S)
        assert len(chunks) == want_n, (doc_id, nt)
        for c in chunks[:-1]:
            assert c.n_tokens_chunk == C
        # last chunk covers through the final token
        last_start = (len(chunks) - 1) * S
        assert last_start + chunks[-1].n_tokens_chunk == max(nt, last_start + 1) or (
            nt <= C and chunks[-1].n_tokens_chunk == nt
        )


def test_temperature_mix_flattens_source_weights(spark):
    """alpha=0.5 mixing: a source's keep rate grows with the SQUARE ROOT
    of its char mass, not linearly — the flattening that up-weights small
    corpora relative to proportional sampling.  Also: overall kept
    fraction lands near the 0.4 target, and reruns are byte-identical
    (deterministic md5 thresholds, no rand())."""
    rows = corpus.t36_temperature_mix(spark, SF).collect()
    by_chars = sorted(rows, key=lambda r: r.total_chars)
    small, large = by_chars[0], by_chars[-1]
    r_ratio = large.rate / small.rate
    c_ratio = large.total_chars / small.total_chars
    assert r_ratio < c_ratio  # sub-linear: flattened vs proportional
    assert abs(r_ratio - c_ratio**0.5) < 0.01  # exactly the alpha=0.5 curve
    n_total = sum(r.n_docs for r in rows)
    n_kept = sum(r.n_kept for r in rows)
    assert abs(n_kept / n_total - corpus.MIX_TARGET_FRACTION) < 0.15
    again = corpus.t36_temperature_mix(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_funnel_is_monotone_and_ordered(spark):
    rows = behavioral.q32_event_funnel(spark, SF).collect()
    counts = [r.n_users for r in rows]
    assert [r.stage for r in rows] == [
        "1_all_users",
        "2_first_view",
        "3_click_after_view",
        "4_purchase_after_click",
    ]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].step_conversion_pct is None


def test_funnel_respects_event_order(spark):
    """A user who purchases BEFORE clicking must not reach stage 4."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    evs = [
        # user 1: view -> click -> purchase (full funnel)
        (1, 1, "view", base),
        (2, 1, "click", base + dt.timedelta(minutes=1)),
        (3, 1, "purchase", base + dt.timedelta(minutes=2)),
        # user 2: purchase then view then click (no purchase AFTER click)
        (4, 2, "purchase", base),
        (5, 2, "view", base + dt.timedelta(minutes=1)),
        (6, 2, "click", base + dt.timedelta(minutes=2)),
    ]
    ev = spark.createDataFrame(
        evs, "event_id long, user_id long, event_type string, ts timestamp"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    assert {r.user_id for r in c.collect()} == {1, 2}
    assert {r.user_id for r in p.collect()} == {1}


def test_rolling_revenue_window_shrinks_at_gaps(spark):
    """First day's rolling value equals its own day value; every rolling
    sum equals the hand-computed 7-day calendar sum."""
    rows = behavioral.q30_rolling_weekly_revenue(spark, SF).collect()
    by_day = {r.day.date(): r for r in rows}
    days = sorted(by_day)
    first = by_day[days[0]]
    assert first.rolling_revenue == first.day_revenue
    assert first.rolling_orders == first.n_orders
    for d, r in by_day.items():
        want = sum(
            by_day[x].n_orders
            for x in days
            if 0 <= (d - x).days <= 6
        )
        assert r.rolling_orders == want


def test_salted_join_equals_plain_join(spark):
    """Salted join must be value-identical to the plain join on skewed
    data (90% of rows share one key), for inner and left, and the hot
    key must actually fan out across salt buckets."""
    from ecommerce_data_pipeline_23a91a05i4_spark.operators.skew import salted_join

    large = spark.range(2000).selectExpr(
        "id", "case when id % 10 < 9 then 1 else cast(id % 5 as long) end as k"
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (99, "unmatched")], "k long, label string"
    )
    for how in ("inner", "left"):
        got = salted_join(large, small, "k", how=how, salt_source="id")
        want = large.join(small, "k", how)
        assert got.count() == want.count(), how
        g = {(r.k, r.id, r.label) for r in got.collect()}
        w = {(r.k, r.id, r.label) for r in want.collect()}
        assert g == w, how

    # fan-out: the hot key's rows must spread over >1 salt bucket
    from pyspark.sql import functions as F

    salted = large.withColumn("_salt", F.pmod(F.xxhash64("id"), F.lit(8)))
    n_buckets = (
        salted.filter("k = 1").select("_salt").distinct().count()
    )
    assert n_buckets >= 4


def test_epoch_plan_invariants(spark):
    """t45's schedule must respect its own contract on any corpus: the
    integer allocation sums to the budget up to per-source floor loss,
    epochs stay within [1, MAX_EPOCHS], and planned tokens never exceed
    either the allocation or epochs x unique tokens."""
    out = corpus.t45_epoch_plan(spark, SF).collect()
    assert len(out) > 1
    total_tokens = sum(r.n_tokens for r in out)
    budget = corpus.BUDGET_FACTOR * total_tokens
    alloc_sum = sum(r.alloc_tokens for r in out)
    assert budget - len(out) < alloc_sum <= budget  # floor-division loss only
    for r in out:
        assert 1 <= r.epochs <= corpus.MAX_EPOCHS
        assert r.planned_tokens <= r.alloc_tokens
        assert r.planned_tokens <= r.epochs * r.n_tokens
        # planned is exactly the binding constraint of the two
        assert r.planned_tokens == min(r.alloc_tokens, r.epochs * r.n_tokens)


def test_dataset_split_is_stable_and_roughly_proportioned(spark):
    """Split assignment is a pure function of doc_id: restricting the
    corpus to any subset never moves a surviving document between
    splits (the no-leakage-across-versions property), and the global
    proportions land near the configured 90/5/5."""
    full = {
        (r.source, r.split): r.n_docs
        for r in corpus.t50_dataset_split(spark, "/root/testdata/sf0.01").collect()
    }
    total = sum(full.values())
    train = sum(v for (s, sp), v in full.items() if sp == "train")
    assert 0.85 <= train / total <= 0.95
    # pure-function assignment: recompute the split expression on the
    # FULL corpus and on a filtered subset of the same table — every
    # surviving doc_id must keep its split (no leakage across versions)
    from pyspark.sql import functions as F
    from ecommerce_data_pipeline_23a91a05i4_spark.operators.dedup import (
        md5_hash32,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    h = F.pmod(
        md5_hash32(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))),
        F.lit(corpus.SPLIT_MOD),
    )
    split = (
        F.when(h < corpus.SPLIT_VAL_PER_MILLE, F.lit("validation"))
        .when(
            h < corpus.SPLIT_VAL_PER_MILLE + corpus.SPLIT_TEST_PER_MILLE,
            F.lit("test"),
        )
        .otherwise(F.lit("train"))
    )
    all_assign = {
        r.doc_id: r.s
        for r in docs.select("doc_id", split.alias("s")).collect()
    }
    subset_assign = {
        r.doc_id: r.s
        for r in docs.filter(F.col("doc_id") < 1000)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert subset_assign == {
        k: v for k, v in all_assign.items() if k < 1000
    }


def test_t75_transitions_planted_sequence(spark, tmp_path):
    """A planted one-user sequence A,B,A,B,C pins the lag semantics and
    row normalization: A->B twice (p=1.0), B->A and B->C once each
    (p=0.5)."""
    import datetime as dt

    from ecommerce_data_pipeline_23a91a05i4_spark.plans import behavioral

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, t, 1.0, "{}")
        for i, t in enumerate(["A", "B", "A", "B", "C"])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.prev_type, r.next_type): (r.n_trans, r.p_trans)
        for r in behavioral.t75_event_transitions(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        ("A", "B"): (2, 1.0),
        ("B", "A"): (1, 0.5),
        ("B", "C"): (1, 0.5),
    }


def test_q35_market_basket_cap_and_metrics(spark, tmp_path):
    """Planted baskets pin the association metrics and the hot-basket
    cap: orders {1,2},{1,2},{1,3} give exactly one surviving pair
    (1,2) with support 2/n, confidence 2/3, lift n·2/(3·2); two
    identical 20-item mega-baskets co-occur on every pair, but items
    ranked past BASKET_CAP are cut, so their tail pairs never reach
    MIN_PAIR_COUNT."""
    from ecommerce_data_pipeline_23a91a05i4_spark.plans import relational

    rows = (
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)]
        + [(o, p) for o in (4, 5) for p in range(100, 120)]
    )
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        (r.part_a, r.part_b): r
        for r in relational.q35_market_basket(
            spark, str(tmp_path)
        ).collect()
    }
    n_orders = 5
    r = out[(1, 2)]
    assert r.n_pair == 2
    assert abs(r.support - 2 / n_orders) < 1e-6
    assert abs(r.confidence - 2 / 3) < 1e-6  # 6-digit quantized
    assert abs(r.lift - (2 * n_orders) / (3 * 2)) < 1e-6
    # capped: parts 100..115 survive in both mega-baskets (pairs at 2);
    # parts 116..119 are ranked past BASKET_CAP and cut
    assert (100, 101) in out and out[(100, 101)].n_pair == 2
    assert not any(a >= 116 or b >= 116 for a, b in out)
