"""Monitoring + data-quality queries, re-expressing the reference's
quality-check and monitoring operator suite (SURVEY.md §2.9, reference
scripts/quality_checks/validate_data.py and sql/queries/monitoring_queries.sql)
on the driver's testdata tables.

    q11 referential integrity   (J3 left-anti orphan counts, U1 union)
    q12 duplicate detection     (A6 HAVING count>1)
    q13 freshness               (U1 labeled UNION ALL of MAX timestamps, Q7)
    q14 volume anomaly          (A9/Q8 3-sigma daily-volume test)
    q15 hourly event rollup     (batch analog of the streaming windowed agg)
    q16 user sessionization     (lag + cumulative-sum window; gap > 30 min)

Determinism notes:
- q14 does the 3-sigma test in exact BIGINT arithmetic
  ((n·x−Σx)²·(n−1) > 9·n·(n·Σx²−(Σx)²)) instead of float mean/stddev, so
  the anomaly flag can never flip between engines from summation order.
- q16 orders events by (ts, event_id) so ties are deterministic, and
  compares microsecond integers, not float epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.exprs import dsum, mean2, r2

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


def q11_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-row counts across every FK edge of the star schema.

    Reference: the three orphan checks in validate_data.py:132-157 /
    data_quality_checks.sql:89-107, as left-anti joins (no key-set collect).
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    part = table(spark, sf_dir, "part")
    nation = table(spark, sf_dir, "nation")

    def orphans(name: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        return (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("violation_count"))
            .select(F.lit(name).alias("check_name"), "violation_count")
        )

    return (
        orphans("lineitem_without_order", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(orphans("lineitem_without_part", li, "l_partkey", part, "p_partkey"))
        .unionAll(orphans("order_without_customer", orders, "o_custkey", cust, "c_custkey"))
        .unionAll(orphans("customer_without_nation", cust, "c_nationkey", nation, "n_nationkey"))
        .orderBy("check_name")
    )


def t30_corpus_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data hygiene twin of q11: every cross-table invariant of
    the corpus tables as one left-anti/aggregate pass — embeddings
    without a backing document, documents without an embedding
    (coverage gap, not necessarily an error — counted, not asserted),
    duplicate vec_ids, and events from users with no document author
    analog are out of scope (no such FK).  Same plan shape as q11: no
    key-set collect, each check is a broadcast-or-shuffle anti join."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    emb = table(spark, sf_dir, "embeddings")

    def check(name: str, df: DataFrame):
        return df.agg(F.count(F.lit(1)).alias("violation_count")).select(
            F.lit(name).alias("check_name"), "violation_count"
        )

    orphan_emb = emb.join(docs, emb.vec_id == docs.doc_id, "left_anti")
    uncovered_docs = docs.join(emb, docs.doc_id == emb.vec_id, "left_anti")
    dup_vecs = (
        emb.groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return (
        check("duplicate_vec_id", dup_vecs)
        .unionAll(check("document_without_embedding", uncovered_docs))
        .unionAll(check("embedding_without_document", orphan_emb))
        .orderBy("check_name")
    )


def q12_duplicate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-based duplicate detection (ref data_quality_checks.sql:27-36):
    users with more than one event of the same type."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .filter(F.col("event_count") > 1)
        .orderBy("user_id", "event_type")
    )


def q13_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled UNION ALL of per-source MAX timestamps
    (ref monitoring_queries.sql:4-21)."""
    events = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def latest(name: str, df: DataFrame, col: str):
        return df.agg(F.max(col).alias("latest_ts")).select(
            F.lit(name).alias("source"), "latest_ts"
        )

    return (
        latest("events", events, "ts")
        .unionAll(latest("orders", orders, "o_orderdate"))
        .unionAll(latest("lineitem", li, "l_shipdate"))
        .orderBy("source")
    )


def q14_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume 3-sigma anomaly flags
    (ref pipeline_monitor.py:170-189).

    The test (x−mean)² > (3·stddev_samp)² is algebraically rearranged into
    pure BIGINT arithmetic so both engines compute identical booleans.
    """
    events = table(spark, sf_dir, "events")
    # date_trunc (timestamp), not to_date: DATE columns surface as
    # python-object dates in Spark's toPandas but datetime64 in DuckDB's,
    # which would fail the driver's dtype/value comparison.
    daily = events.groupBy(F.date_trunc("day", F.col("ts")).alias("event_date")).agg(
        F.count(F.lit(1)).alias("event_count")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("event_count").alias("sx"),
        F.sum(F.col("event_count") * F.col("event_count")).alias("sxx"),
    )
    d = daily.crossJoin(F.broadcast(stats))
    dlt = F.col("n_days") * F.col("event_count") - F.col("sx")
    lhs = dlt * dlt * (F.col("n_days") - 1)
    rhs = 9 * F.col("n_days") * (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return d.select(
        "event_date",
        "event_count",
        (lhs > rhs).alias("is_anomaly"),
    ).orderBy("event_date")


def q15_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window rollup per event type — the batch twin of the
    Structured Streaming aggregation in streaming/ (SURVEY.md §2.10)."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            r2(dsum(F.col("value"))).alias("total_value"),
            mean2(F.col("value"), F.count(F.lit(1))).alias("avg_value"),
        )
        .orderBy("window_start", "event_type")
    )


def s1_streaming_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming == batch parity gate: drains the Structured Streaming
    twin of q15 (file-source readStream → complete-mode aggregation →
    memory sink, availableNow trigger) and returns the final table.

    Because hourly_event_counts_exact uses the same deterministic
    arithmetic as the batch query, this gate shares q15's DuckDB oracle
    — the driver independently proves the streaming path computes the
    batch answer.  At scale the same plan runs continuously against
    Kafka with a watermark (streaming/ingest.hourly_event_counts);
    availableNow replay is the standard backfill mode."""
    import os
    import uuid

    from ..streaming import ingest as st

    ev = st.stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    agg = st.hourly_event_counts_exact(ev)
    name = "s1_hourly_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.table(name)
        .orderBy("window_start", "event_type")
        .localCheckpoint(eager=True)  # materialize before dropping the sink
    )
    spark.catalog.dropTempView(name)
    return result


def s2_streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-streaming parity gate: drains the applyInPandasWithState
    sessionizer (update mode emits the running per-user counts each
    micro-batch) and rolls up to the final value with max() — sound
    because both counters are monotone non-decreasing — so the result is
    batch-split-invariant.  The oracle recomputes sessions with the q16
    window arithmetic, independently proving the one Python-stateful
    operator in the engine against SQL semantics."""
    import os
    import uuid

    from ..streaming import ingest as st

    ev = st.stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    sess = st.sessionize_stream(ev)
    name = "s2_sessions_" + uuid.uuid4().hex[:8]
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
        .orderBy("user_id")
        .localCheckpoint(eager=True)  # materialize before dropping the sink
    )
    spark.catalog.dropTempView(name)
    return result


def s2b_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native streaming sessionization parity gate: the built-in
    ``session_window`` aggregation (streaming/ingest.sessionize_native)
    drained complete-mode with availableNow, rolled up to the same
    per-user shape as q16 — and sharing q16's FULL oracle including
    longest_session_us, which the Python-stateful s2 twin cannot produce.

    Unlike s2's applyInPandasWithState fold (arrival-order across
    batches, documented limitation), the native operator's state store
    merges sessions across micro-batches, so out-of-order batch arrival
    yields the same sessions (tests/test_streaming.py feeds
    new-then-old batches).  Complete mode is the finite-replay drain;
    production uses watermark + append for bounded state."""
    import os
    import uuid

    from ..streaming import ingest as st

    ev = st.stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    sess = st.sessionize_native(ev)
    name = "s2b_sessions_" + uuid.uuid4().hex[:8]
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    result = (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.max(
                F.unix_micros(F.col("session_end"))
                - F.unix_micros(F.col("session_start"))
            ).alias("longest_session_us"),
        )
        .orderBy("user_id")
    )
    result = result.localCheckpoint(eager=True)  # materialize before drop
    spark.catalog.dropTempView(name)
    return result


def s2c_session_window_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-mode native sessionization (VERDICT r4 ask #7): the
    session_window aggregation with a WATERMARK in APPEND mode — state
    is evicted as the watermark advances and each finalized session is
    emitted exactly once, the form that runs unbounded streams (s2b's
    complete-mode drain re-emits everything and keeps all state).

    The events table is replayed as two time-ordered micro-batches
    (split at the midpoint timestamp; every second-batch event is above
    the first batch's watermark by construction, so the one-directional
    late rule never engages and the emitted set is deterministic).
    Emission rule, pinned empirically on 4.1 and replayed by the
    oracle: a session emits iff window_end = last_event + gap <=
    final watermark = max(ts) - delay; the still-open tail sessions
    stay in state and are NOT in the output.  The oracle recomputes
    sessions with q16's lag/cumsum arithmetic and applies the same
    cutoff — the driver proves watermark bookkeeping against plain
    SQL."""
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming import ingest as st

    events = table(spark, sf_dir, "events")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    split = lo + (hi - lo) / 2
    base = tempfile.mkdtemp(prefix=f"s2c_{uuid.uuid4().hex[:8]}_")
    name = "s2c_sessions_" + uuid.uuid4().hex[:8]
    try:
        src = os.path.join(base, "ev")
        for fname, part, mtime in (
            ("f1.parquet", events.filter(F.col("ts") < F.lit(split)), 1000),
            ("f2.parquet", events.filter(F.col("ts") >= F.lit(split)), 2000),
        ):
            p = os.path.join(src, fname)
            part.coalesce(1).write.parquet(p)
            for root, _, fs in os.walk(p):
                for f in fs:
                    os.utime(os.path.join(root, f), (mtime, mtime))
        raw = (
            spark.readStream.schema(st.EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        ev = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        sess = st.sessionize_native(
            ev, gap="30 minutes", watermark="30 minutes"
        )
        q = (
            sess.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.table(name)
            .select("user_id", "session_start", "session_end", "n_events")
            .orderBy("user_id", "session_start")
            .localCheckpoint(eager=True)  # materialize before dropping
        )
        spark.catalog.dropTempView(name)
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)


def s3_streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dedup parity gate: new documents (doc_id % 5 == 0)
    arrive as a file stream and are screened IN-FLIGHT against the static
    corpus LSH index — zero streaming state (per-row banding via
    dedup.rowwise_md5_bands + two stream-static joins; see
    streaming/ingest.neardup_stream).  The drain is availableNow; the
    multi-band duplicate candidates are collapsed after the drain
    (identical quantized jaccard per pair, so distinct() is exact).

    The oracle recomputes the full-corpus portable-MinHash pairing in
    DuckDB restricted to delta×corpus pairs — the driver independently
    proves the streaming path equals the batch incremental dedup (t31)
    on its cross pairs.  In production corpus_bands/corpus_shingles are
    the persisted bucketed tables t31 maintains; the stream appends its
    own bands to the index after each batch."""
    import os
    import uuid

    from ..functions.exprs import quant
    from ..operators import dedup as dd
    from ..streaming import ingest as st

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    corpus_bands = dd.md5_band_table(
        dd.minhash_md5_signatures(dd.shingle_table(corpus, "doc_id", "text", n=2))
    )
    corpus_shingles = corpus.select(
        F.col("doc_id").alias("id"), dd.shingle_array(F.col("text")).alias("shingles")
    )
    delta = st.stream_documents(
        spark, os.path.join(sf_dir, "documents.parquet")
    ).filter(F.col("doc_id") % 5 == 0)
    pairs = st.neardup_stream(delta, corpus_bands, corpus_shingles)
    name = "s3_neardup_" + uuid.uuid4().hex[:8]
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.table(name)
        .select("id_a", "id_b", quant(F.col("jaccard"), 6).alias("jaccard"))
        .distinct()
        .orderBy("id_a", "id_b")
        .localCheckpoint(eager=True)  # materialize before dropping the sink
    )
    spark.catalog.dropTempView(name)
    return result


def s7_streaming_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SEMANTIC dedup parity gate (s3's embedding twin): new
    vectors (vec_id % 5 == 0) arrive as a file stream and are screened
    IN-FLIGHT against the persisted semantic state — frozen trained
    centroids as per-row literals + the semdedup_assign store — with
    zero streaming state (streaming/ingest.semdedup_stream).  The drain
    is availableNow; the oracle unrolls the corpus-only k-means
    training, assigns both sides, and emits the same (delta, corpus)
    near-dup pairs — the driver independently proves the stateless
    rowwise assignment equals the batch path's window argmax, sub keys
    included."""
    import os
    import uuid

    from ..operators import similarity as sim
    from ..plans.llmdata import NEARDUP_COSINE, SEMDEDUP_INC_GATE_K
    from ..streaming import ingest as st

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    cents = sim.ivf_train(
        corpus,
        k=SEMDEDUP_INC_GATE_K,
        iters=sim.SEMDEDUP_ITERS,
        assign_bits=sim.assign_bits_for(SEMDEDUP_INC_GATE_K),
    )
    centroid_rows = [
        (r.cluster_id, [float(x) for x in r.centroid]) for r in cents.collect()
    ]
    store = sim.semdedup_assign(corpus, cents)
    delta = st.stream_embeddings(
        spark, os.path.join(sf_dir, "embeddings.parquet")
    ).filter(F.col("vec_id") % 5 == 0)
    pairs = st.semdedup_stream(
        delta, store, centroid_rows, threshold=NEARDUP_COSINE
    )
    name = "s7_semdedup_" + uuid.uuid4().hex[:8]
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.table(name)
        .distinct()
        .orderBy("vec_id", "corpus_id")
        .localCheckpoint(eager=True)  # materialize before dropping the sink
    )
    spark.catalog.dropTempView(name)
    return result


def q16_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a >30 min gap.

    lag() + cumulative sum over (user_id ORDER BY ts, event_id) — the
    window-function surface the reference lacks but any event pipeline
    needs; scale path is a single shuffle on user_id.
    """
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    sessionized = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0).alias("is_start"),
    ).select(
        "user_id",
        "ts",
        F.sum("is_start").over(w).alias("session_seq"),
    )
    per_session = sessionized.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max(F.unix_micros(F.col("session_end")) - F.unix_micros(F.col("session_start")))
            .alias("longest_session_us"),
        )
        .orderBy("user_id")
    )


def s4_streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: documents arrive as a file stream and
    ``dropDuplicates`` on the content fingerprint keeps first-arrival
    only — the in-flight twin of t4's batch exact dedup.  The drained
    output projects the fingerprint alone, so the result is exactly the
    DISTINCT fingerprint set however micro-batches split, which is what
    the DuckDB oracle independently recomputes (the one streaming-exact-
    dedup statement that is arrival-order-free and thus hash-checkable).

    State discipline at scale: plain dropDuplicates keys state by
    fingerprint forever (fine for the finite availableNow replay here);
    a continuous deployment bounds it with
    ``withWatermark + dropDuplicatesWithinWatermark``, trading eternal
    exactness for bounded state — the documented production variant."""
    import os
    import uuid

    from ..operators.text import content_fingerprint
    from ..streaming import ingest as st

    docs = st.stream_documents(spark, os.path.join(sf_dir, "documents.parquet"))
    deduped = docs.select(
        content_fingerprint(F.col("text")).alias("fp")
    ).dropDuplicates(["fp"])
    name = "s4_dedup_" + uuid.uuid4().hex[:8]
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.table(name)
        .select("fp")
        .distinct()
        .orderBy("fp")
        .localCheckpoint(eager=True)  # materialize before dropping the sink
    )
    spark.catalog.dropTempView(name)
    return result


def s5_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight curation: the new batch (doc_id % 5 == 0) flows through
    PII redaction (t32's planted input, operators/curation.redact_pii)
    and the hashed-feature quality scorer (t42's
    operators/curation.classifier_scores expressions) INSIDE the stream
    — a pure map-only streaming stage (append mode, zero state, zero
    shuffles), which is exactly how curation runs between ingest and the
    stateful dedup stages at scale.  Because the expressions are the
    same column exprs as the batch gates', the DuckDB oracle replays the
    whole thing and the driver proves stream == batch on values."""
    import os
    import uuid

    from ..operators import curation as cu
    from ..plans.llmdata import plant_pii
    from ..streaming import ingest as st

    delta = st.stream_documents(
        spark, os.path.join(sf_dir, "documents.parquet")
    ).filter(F.col("doc_id") % 5 == 0)
    did = F.col("doc_id")
    aug = plant_pii(did)
    counts = cu.pii_counts(aug)
    n_pii = (
        counts["email"].cast("long")
        + counts["phone"].cast("long")
        + counts["ipv4"].cast("long")
    )
    red = cu.redact_pii(aug)
    score = cu.classifier_score(F.col("text"))
    curated = delta.select(
        "doc_id",
        n_pii.alias("n_pii"),
        F.md5(red).alias("redacted_md5"),
        score.alias("score"),
        (score > 0).alias("keep"),
    )
    name = "s5_curation_" + uuid.uuid4().hex[:8]
    q = (
        curated.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.table(name)
        .orderBy("doc_id")
        .localCheckpoint(eager=True)  # materialize before dropping the sink
    )
    spark.catalog.dropTempView(name)
    return result


def s6_streaming_txtable_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingestion into the transactional table:
    the document stream lands in a manifest-log table via the
    foreachBatch sink (sources/txtable.TxTableStreamSink), whose
    batch-id-in-manifest idempotence turns Structured Streaming's
    at-least-once replay into exactly-once appends — the Delta-style
    txn-version pattern on the engine's own format.  The gate drains
    availableNow, reads the FINAL TABLE back, and returns per-source
    stats; the oracle recomputes them from the raw documents, so the
    driver proves no batch was lost or double-committed."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from ..sources.txtable import TxTable, TxTableStreamSink
    from ..streaming import ingest as st

    base = tempfile.mkdtemp(prefix=f"s6_{_uuid.uuid4().hex[:8]}_")
    try:
        docs_schema = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).schema
        t = TxTable(spark, base + "/docs")
        t.init(spark.createDataFrame([], docs_schema))
        stream = st.stream_documents(
            spark, os.path.join(sf_dir, "documents.parquet")
        )
        q = (
            stream.writeStream.foreachBatch(TxTableStreamSink(t))
            .option("checkpointLocation", base + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = (
            t.snapshot()
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("n_chars"),
            )
            .orderBy("source")
            .collect()
        )
        return spark.createDataFrame(
            [tuple(r) for r in rows],
            "source string, n_docs long, n_chars long",
        ).orderBy("source")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def s15_streaming_sink_autocompact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming ingestion WITH auto-compaction (sources/txtable.
    TxTableStreamSink(small_file_limit=...) — VERDICT r7 ask #4: s6
    proves exactly-once appends, t73 proves compact(); this gate
    proves their COMPOSITION, the production shape — per-micro-batch
    commits are the canonical small-file generator, and an unbounded
    manifest is the classic failure mode of transactional tables
    under streaming ingest).  The corpus is split into six source
    files streamed one file per micro-batch (availableNow honors
    maxFilesPerTrigger), so the sink interleaves compact commits with
    batch appends whenever the manifest reaches 3 entries.  Pins:
    ``compaction_ran`` (>= 1 compact op committed mid-stream),
    ``files_below_no_compaction`` (final file count strictly under an
    identically-driven twin table with compaction off),
    ``replay_noop`` (a fresh sink instance replaying batch 0 AFTER
    compaction commits nothing — the stream floor survives compaction
    because every commit carries it forward).  The per-source stats
    come from the final compacted table; the oracle recomputes them
    from raw documents, so the driver proves compaction neither lost
    nor duplicated a single row."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from ..sources.txtable import TxTable, TxTableStreamSink

    base = tempfile.mkdtemp(prefix=f"s15_{_uuid.uuid4().hex[:8]}_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        src_dir = base + "/src"
        docs.repartition(6).write.parquet(src_dir)

        def drain(table_dir: str, ckpt: str, **sink_kw) -> TxTable:
            t = TxTable(spark, table_dir)
            t.init(spark.createDataFrame([], docs.schema))
            sink = TxTableStreamSink(t, app_id="ingest", **sink_kw)
            q = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return t

        t = drain(
            base + "/docs",
            base + "/ckpt",
            small_file_limit=3,
            compact_target_files=1,
        )
        twin = drain(base + "/docs_nc", base + "/ckpt_nc")
        ops = [h["op"] for h in t.history()]
        compaction_ran = any(o == "compact" for o in ops)
        fewer_files = len(t.manifest()["files"]) < len(
            twin.manifest()["files"]
        )
        # replay batch 0 through a FRESH sink instance: only the
        # stream floor (carried through every compact commit) can
        # suppress it now
        v_before = t.latest_version()
        TxTableStreamSink(t, app_id="ingest")(docs.limit(5), 0)
        replay_noop = t.latest_version() == v_before
        rows = (
            t.snapshot()
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("n_chars"),
            )
            .orderBy("source")
            .collect()
        )
        return spark.createDataFrame(
            [tuple(r) for r in rows],
            "source string, n_docs long, n_chars long",
        ).select(
            "source",
            "n_docs",
            "n_chars",
            F.lit(compaction_ran).alias("compaction_ran"),
            F.lit(fewer_files).alias("files_below_no_compaction"),
            F.lit(replay_noop).alias("replay_noop"),
        ).orderBy("source")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def s16_streaming_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop lakehouse pipeline over the engine's own format:
    TxTable A --change-feed stream--> TxTable B (VERDICT r8 ask #2).
    The source is sources/txstream.stream_table_changes — the read
    half of Delta-style CDF streaming (offsets = commit versions in
    the query checkpoint; partitions = changed files) — composed with
    the existing exactly-once TxTableStreamSink, so B accumulates the
    PER-COMMIT row-level diff of A: inserts for appended files,
    delete+re-insert pairs for a file-granular DELETE rewrite.

    A's history is fully determined by the raw documents table:
    v1 init  = docs with doc_id%3==0, partitioned by source (exactly
               one staged file per source: repartition("source")
               puts each value in one task);
    v2 append = docs with doc_id%3==1 (again one file per source);
    v3 delete doc_id%2==0 — file-granular: every (source, commit)
               file CONTAINING an even doc_id is removed (all its
               rows stream as deletes) and its odd-id survivors are
               re-staged (stream as re-inserts);
    v4 append = docs with doc_id%3==2 (the stream continues past a
               rewrite).
    The oracle recomputes all four commits' diffs from raw documents,
    including the hit-file detection — so the driver proves the whole
    chain: source offsets, per-file change attribution, partition-
    column re-injection, and sink idempotence.  Pins: ``replay_noop``
    (a replayed micro-batch through a fresh sink instance commits
    nothing) and ``restart_noop`` (a restarted stream on the same
    checkpoint finds nothing new)."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from ..sources.txstream import stream_table_changes
    from ..sources.txtable import TxTable, TxTableStreamSink

    base = tempfile.mkdtemp(prefix=f"s16_{_uuid.uuid4().hex[:8]}_")
    try:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "source", "n_chars")
        a = TxTable(spark, base + "/a")
        a.init(
            docs.filter(F.col("doc_id") % 3 == 0).repartition("source"),
            partition_by="source",
        )
        a.append(
            docs.filter(F.col("doc_id") % 3 == 1).repartition("source")
        )
        a.delete(F.col("doc_id") % 2 == 0)
        a.append(
            docs.filter(F.col("doc_id") % 3 == 2).repartition("source")
        )

        b = TxTable(spark, base + "/b")
        b.init(
            spark.createDataFrame(
                [],
                "doc_id long, source string, n_chars long, "
                "_change_type string, _commit_version long",
            )
        )

        def hop() -> None:
            q = (
                stream_table_changes(spark, base + "/a")
                .writeStream.foreachBatch(
                    TxTableStreamSink(b, app_id="hop")
                )
                .option("checkpointLocation", base + "/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        hop()
        v = b.latest_version()
        # replayed micro-batch through a FRESH sink instance: only the
        # durable stream floor can suppress it
        TxTableStreamSink(b, app_id="hop")(b.snapshot().limit(0), 0)
        replay_noop = b.latest_version() == v
        # restarted stream on the same checkpoint: offsets resume at
        # A's head, nothing re-emitted, B unchanged
        hop()
        restart_noop = b.latest_version() == v
        rows = (
            b.snapshot()
            .groupBy("_commit_version", "_change_type", "source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("doc_id").cast("long").alias("sum_doc_id"),
                F.sum("n_chars").cast("long").alias("sum_n_chars"),
            )
            .orderBy("_commit_version", "_change_type", "source")
            .collect()
        )
        return (
            spark.createDataFrame(
                [tuple(r) for r in rows],
                "commit_version long, change_type string, source string, "
                "n_rows long, sum_doc_id long, sum_n_chars long",
            )
            .select(
                "*",
                F.lit(replay_noop).alias("replay_noop"),
                F.lit(restart_noop).alias("restart_noop"),
            )
            .orderBy("commit_version", "change_type", "source")
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def s8_streaming_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming COUNT(DISTINCT) with bounded state: hll_registers
    (operators/sketch.py) applied to a file stream IS the stateful
    operator — a (group, register) MAX aggregation whose state can
    never exceed 2^p rows per group however many events flow, where
    exact streaming distinct would hold one state row per distinct
    value forever (the state blow-up that kills such queries at 100
    TB/day).  Drained in complete mode, the final register state is
    compared REGISTER-FOR-REGISTER to the batch sketch of the same
    data (``stream_equals_batch`` — micro-batch splits must be
    invisible, the max-merge algebra's defining property), then
    estimated with the shared portable estimator; the oracle replays
    sketch+estimate from raw events exactly as t67 does."""
    import os
    import uuid

    from ..operators import sketch as sk
    from ..streaming import ingest as st

    path = os.path.join(sf_dir, "events.parquet")
    ev = st.stream_events(spark, path)
    regs = sk.hll_registers(ev, ["event_id"], ["event_type"], p=4, hash="md5")
    name = "s8_sketch_" + uuid.uuid4().hex[:8]
    stream_regs = st.run_available_now(
        regs, name, output_mode="complete", materialize=True
    )
    batch = spark.read.parquet(path)
    batch_regs = sk.hll_registers(
        batch, ["event_id"], ["event_type"], p=4, hash="md5"
    )
    same = st.stream_equals_batch(stream_regs, batch_regs)
    est = sk.hll_estimate(stream_regs, ["event_type"], p=4)
    exact = batch.groupBy("event_type").agg(
        F.count_distinct("event_id").cast("long").alias("n_exact")
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.col("approx_distinct").alias("approx_events"),
            F.lit(same).alias("stream_equals_batch"),
        )
        .orderBy("event_type")
    )


def _cdc_docs_and_changes(spark: SparkSession, sf_dir: str):
    """The shared s9/s10 CDC fixture: a documents corpus (doc_id % 3
    != 0) plus a 4-way change feed — superseded 'stale' updates at seq
    1, winning ' [cdc]' updates at seq 2, deletes of % 7 keys at seq 3,
    inserts of the % 3 == 0 keys — returned as (corpus, changes), the
    changes localCheckpoint-ed once (the 4-way union is re-read by each
    per-band feed write; 12 source scans otherwise)."""
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    data_cols = ["doc_id", "text", "lang", "source", "n_chars"]
    corpus = docs.select(*data_cols).filter(did % 3 != 0)
    upd_text = F.concat(F.col("text"), F.lit(" [cdc]"))
    stale = docs.filter((did % 3 != 0) & (did % 5 == 0)).select(
        "doc_id",
        F.lit("stale").alias("text"),
        "lang",
        "source",
        F.lit(5).cast("long").alias("n_chars"),
        F.lit("U").alias("op"),
        F.lit(1).cast("long").alias("seq"),
    )
    upd = docs.filter((did % 3 != 0) & (did % 5 == 0)).select(
        "doc_id",
        upd_text.alias("text"),
        "lang",
        "source",
        F.length(upd_text).cast("long").alias("n_chars"),
        F.lit("U").alias("op"),
        F.lit(2).cast("long").alias("seq"),
    )
    dels = docs.filter(did % 7 == 0).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("n_chars"),
        F.lit("D").alias("op"),
        F.lit(3).cast("long").alias("seq"),
    )
    ins_text = F.concat(F.lit("cdc doc "), did.cast("string"))
    ins = docs.filter(did % 3 == 0).select(
        "doc_id",
        ins_text.alias("text"),
        "lang",
        F.lit("cdc").alias("source"),
        F.length(ins_text).cast("long").alias("n_chars"),
        F.lit("I").alias("op"),
        F.lit(1).cast("long").alias("seq"),
    )
    changes = (
        stale.unionAll(upd).unionAll(dels).unionAll(ins)
        .localCheckpoint(eager=True)
    )
    return corpus, changes


def s11_streaming_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FREQUENCY sketch with bounded state — the Count-Min
    member of the streaming-sketch family (s8 proved the distinct-count
    member): cms_build (operators/sketch.py) applied to the event
    stream IS the stateful operator, a (d, w) COUNT aggregation whose
    state can never exceed depth×width counter rows however many events
    flow, where exact per-key streaming counts hold one state row per
    distinct key forever.  Drained in complete mode, the final counters
    are compared COUNTER-FOR-COUNTER to the batch sketch of the same
    data (``stream_equals_batch`` — micro-batch splits must be
    invisible, the counter-sum algebra's defining property), then the
    ten most frequent users (deterministic count-desc/user-asc pick
    both engines repeat) are estimated from the drained sketch;
    ``no_undercount`` pins the published one-sided guarantee per key.
    The oracle replays salted-md5 addressing → counters → min-lookup
    from raw events exactly as t70 does."""
    import os
    import uuid

    from ..operators import sketch as sk
    from ..streaming import ingest as st

    path = os.path.join(sf_dir, "events.parquet")
    ev = st.stream_events(spark, path)
    counters = sk.cms_build(ev, ["user_id"], depth=4, width=256)
    name = "s11_cms_" + uuid.uuid4().hex[:8]
    stream_cnt = st.run_available_now(
        counters, name, output_mode="complete", materialize=True
    )
    batch = spark.read.parquet(path)
    batch_cnt = sk.cms_build(batch, ["user_id"], depth=4, width=256)
    same = st.stream_equals_batch(stream_cnt, batch_cnt)
    exact = (
        batch.filter(F.col("user_id").isNotNull())  # mirror cms_build
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    )
    top = exact.orderBy(F.desc("exact_n"), F.asc("user_id")).limit(10)
    est = sk.cms_estimate(
        stream_cnt, top.select("user_id"), ["user_id"], depth=4, width=256
    )
    return (
        top.join(est, "user_id")
        .select(
            "user_id",
            "exact_n",
            F.col("cms_count").alias("cms_n"),
            (F.col("cms_count") >= F.col("exact_n")).alias("no_undercount"),
            F.lit(same).alias("stream_equals_batch"),
        )
        .orderBy("user_id")
    )


def s14_streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT deduplication with watermark-bounded state —
    dropDuplicatesWithinWatermark, the operator that makes exact
    streaming dedup survivable at scale: plain dropDuplicates holds one
    state row per key FOREVER (the state blow-up that kills at-least-
    once ingestion pipelines), while the watermark variant expires keys
    once they age past the delay, so state is bounded by the duplicate
    horizon, not the stream's lifetime.  Duplicates are planted
    statelessly on the stream itself (event_id % 7 == 0 rows emitted
    twice — the exact at-least-once shape file/Kafka replays produce),
    arrive within the same micro-batch (inside any watermark), and must
    be removed; the drained result is pinned row-for-row equal to the
    raw batch (``stream_equals_batch``), and the returned per-type
    (count, exact BIGINT id-sum) aggregate is replayed by the oracle
    from raw events — planted duplicates must be invisible end-to-end."""
    import os
    import uuid

    from ..streaming import ingest as st

    path = os.path.join(sf_dir, "events.parquet")
    ev = st.stream_events(spark, path)
    copies = F.when(
        F.col("event_id") % 7 == 0, F.array(F.lit(0), F.lit(1))
    ).otherwise(F.array(F.lit(0)))
    dup = ev.withColumn("_copy", F.explode(copies)).drop("_copy")
    # the delay deliberately exceeds any fixture's ts span: the gate
    # pins DEDUP correctness, and a shorter horizon would silently
    # drop out-of-order rows as late if the source ever split the
    # drain into multiple batches (self-review r7) — the bounded-state
    # EXPIRY semantics are pinned by the dedicated four-batch unit
    # test, where the horizon is the subject
    dedup = dup.withWatermark("ts", "3650 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = "s14_dedup_" + uuid.uuid4().hex[:8]
    got = st.run_available_now(
        dedup, name, output_mode="append", materialize=True
    )
    batch = spark.read.parquet(path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    same = st.stream_equals_batch(got, batch)
    return (
        got.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("event_id").cast("long").alias("sum_event_id"),
        )
        .select(
            "event_type",
            "n_events",
            "sum_event_id",
            F.lit(same).alias("stream_equals_batch"),
        )
        .orderBy("event_type")
    )


def s13_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy-hitter ENUMERATION — the t70b composition fed by
    the STREAM's drained state: cms_build on a planted-skew event
    stream is the stateful operator (≤ depth×width counter rows
    forever), and the candidate set + threshold pass
    (operators/sketch.cms_heavy_hitters) runs over the DRAINED
    counters — top keys over an unbounded stream without per-key
    streaming state.  Skew is planted on the stream itself (stateless
    explode: user_id % 10 == 0 events ×9), so hot users carry share
    ≈ 5/U vs normal ≈ 0.56/U whatever the scale factor, and the
    threshold 2/U sits cleanly between — SF-invariant by construction.
    Drained counters are pinned counter-for-counter equal to the batch
    sketch (``stream_equals_batch``); truly_heavy and
    n_missed_true_heavies pin per-key agreement and the one-sided
    no-false-negative guarantee exactly as t70b does.  The oracle
    replays skew, sample, sketch, estimate, and the derived threshold
    relationally."""
    import os
    import uuid

    from ..operators import sketch as sk
    from ..streaming import ingest as st

    depth, width, mod = 4, 2048, 8
    path = os.path.join(sf_dir, "events.parquet")
    reps = F.when(
        F.col("user_id") % 10 == 0, F.sequence(F.lit(0), F.lit(8))
    ).otherwise(F.sequence(F.lit(0), F.lit(0)))

    def skewed(df: DataFrame) -> DataFrame:
        return df.select(
            "user_id", "event_id", F.explode(reps).alias("rep")
        )

    ev = skewed(st.stream_events(spark, path))
    counters = sk.cms_build(ev, ["user_id"], depth=depth, width=width)
    name = "s13_cms_" + uuid.uuid4().hex[:8]
    stream_cnt = st.run_available_now(
        counters, name, output_mode="complete", materialize=True
    )
    batch = skewed(spark.read.parquet(path)).localCheckpoint(eager=True)
    batch_cnt = sk.cms_build(batch, ["user_id"], depth=depth, width=width)
    same = st.stream_equals_batch(stream_cnt, batch_cnt)
    # one aggregate for both scalars; count_distinct excludes NULL
    # keys, matching the oracle's COUNT(DISTINCT) and cms_build's NULL
    # exclusion (self-review r7: distinct().count() would count a NULL
    # user as a user and shift the derived bar)
    n, n_users = batch.agg(
        F.count(F.lit(1)), F.count_distinct("user_id")
    ).first()
    if n_users == 0:
        raise ValueError(
            "s13_streaming_heavy_hitters: events.user_id has no "
            "non-NULL values — cannot derive the heavy-hitter bar"
        )
    threshold = 2.0 / n_users
    import math

    need = math.ceil(threshold * n)
    hh = sk.cms_heavy_hitters(
        batch,
        ["user_id"],
        F.concat_ws("\x1f", "event_id", "rep"),
        threshold=threshold,
        sample_mod=mod,
        depth=depth,
        width=width,
        counters=stream_cnt,
        n_total=n,
    ).localCheckpoint(eager=True)
    exact = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    true_heavies = exact.filter(F.col("exact_n") >= need)
    n_true = true_heavies.count()
    n_missed = true_heavies.join(
        hh.select("user_id"), "user_id", "left_anti"
    ).count()
    return (
        hh.join(exact, "user_id")
        .select(
            "user_id",
            F.col("cms_count").alias("cms_n"),
            "exact_n",
            (F.col("exact_n") >= F.lit(need)).alias("truly_heavy"),
            F.lit(n_true).cast("long").alias("n_true_heavies"),
            F.lit(n_missed).cast("long").alias("n_missed_true_heavies"),
            F.lit(same).alias("stream_equals_batch"),
        )
        .orderBy("user_id")
    )


def s12_streaming_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming QUANTILES with bounded state — the third member of
    the streaming-sketch family (s8 distinct counts, s11 frequencies):
    hist_build (operators/sketch.py) applied to the event stream IS the
    stateful operator, a per-bin COUNT aggregation whose state can
    never exceed ``bins`` rows however many events flow, where exact
    streaming percentiles would have to buffer every value.  Drained in
    complete mode, the final bin counts are compared BIN-FOR-BIN to the
    batch histogram (``stream_equals_batch`` — the bin-sum algebra
    makes micro-batch splits invisible), then p50/p90/p99 are estimated
    by the deterministic first-bin-reaching-ceil(q·N) upper-edge rule;
    ``within_bin`` pins the construction guarantee |est − exact order
    statistic| ≤ one bin width, computed Spark-side against the true
    ceil(q·N)-th smallest value.  Bounds come from a one-row min/max
    scan of the same data (production would use domain bounds) so no
    value ever clamps into an edge bin — clamping is exactly where the
    within-bin guarantee stops holding, and a hardcoded range would
    silently cross that line on a bigger fixture.  NULL values are
    excluded end-to-end, mirroring hist_build.  The oracle replays
    bounds, binning, cumulative counts, and the quantile rule from raw
    events exactly as t71 does for orders."""
    import math
    import os
    import uuid

    from ..operators import sketch as sk
    from ..streaming import ingest as st

    bins = 200
    path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(path)
    vx = F.col("value").cast("double")
    vals = batch.filter(vx.isNotNull())
    mn, mx, n = vals.agg(F.min(vx), F.max(vx), F.count(F.lit(1))).first()
    if mn is None:
        raise ValueError(
            "s12_streaming_hist_quantiles: events.value has no non-NULL "
            "values — cannot derive histogram bounds"
        )
    lo, hi = float(mn), max(float(mx), float(mn) + 1.0)
    w = (hi - lo) / bins
    ev = st.stream_events(spark, path)
    h = sk.hist_build(ev, "value", lo, hi, bins)
    name = "s12_hist_" + uuid.uuid4().hex[:8]
    stream_hist = st.run_available_now(
        h, name, output_mode="complete", materialize=True
    )
    batch_hist = sk.hist_build(batch, "value", lo, hi, bins)
    same = st.stream_equals_batch(stream_hist, batch_hist)
    qs = [0.5, 0.9, 0.99]
    est = sk.hist_quantile(stream_hist, qs, lo, hi, bins)
    targets = {float(p): int(math.ceil(p * n)) for p in qs}
    # exact ranked values via a TWO-PHASE rank (VERDICT r9: a
    # Window.orderBy with no partitionBy funnels every row through one
    # reducer — fine at gate scale, a single-task sort at corpus
    # scale).  Phase 1: DETERMINISTIC fixed-width value buckets over
    # the [lo, hi] span already probed above (bucket i wholly precedes
    # i+1) and rank locally per bucket; phase 2: per-bucket counts
    # (<= 32 rows) become driver-side cumulative offsets, and global
    # rank = offset + local rank.  NOT repartitionByRange: its
    # reservoir sample is seeded by the RDD id, so two actions over
    # the same lineage (the counts pass and the rank pass) can see
    # DIFFERENT boundaries — offsets that disagree with the ranks.
    nb = 32
    width = (hi - lo) / nb or 1.0
    bucket = (
        F.least(
            F.lit(nb - 1),
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
        )
        .cast("int")
        .alias("_p")
    )
    parted = vals.select(vx.alias("v"), "event_id").withColumn(
        "_p", bucket
    )
    counts = {
        r._p: r.c
        for r in parted.groupBy("_p")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    off, acc = {}, 0
    for p in sorted(counts):
        off[p] = acc
        acc += counts[p]
    off_df = spark.createDataFrame(
        list(off.items()), "_p int, _off long"
    )
    ranked = (
        parted.withColumn(
            "_lr",
            F.row_number().over(
                Window.partitionBy("_p").orderBy("v", "event_id")
            ),
        )
        .join(F.broadcast(off_df), "_p")
        .select("v", (F.col("_lr") + F.col("_off")).alias("rn"))
    )
    by_rn = {
        r.rn: r.v
        for r in ranked.filter(
            F.col("rn").isin(list(targets.values()))
        ).collect()
    }
    rows = [
        (p, by_rn[rn]) for p, rn in sorted(targets.items())
    ]
    exact = spark.createDataFrame(rows, "q double, exact_v double")
    return (
        est.join(exact, "q")
        .select(
            "q",
            "est",
            (F.abs(F.col("est") - F.col("exact_v")) <= F.lit(w)).alias(
                "within_bin"
            ),
            F.lit(same).alias("stream_equals_batch"),
        )
        .orderBy("q")
    )


def s9_streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: a change FEED arrives as files and each
    micro-batch lands on the transactional table as ONE merge commit
    (foreachBatch → sources/txtable.apply_cdc) — minute-cadence CDC
    with file-granular cost, the streaming composition of t66.  The
    feed is written as three files over DISJOINT key ranges
    (doc_id % 9 bands), so the final table state is independent of
    micro-batch boundaries and arrival order — which is what lets one
    relational oracle replay it: corpus minus all touched keys, plus
    the surviving events (within a batch, latest-seq-wins is still
    exercised by planted superseded events).  maxFilesPerTrigger=1
    under availableNow forces a real multi-batch drain; n_versions
    pins that every batch committed exactly one merge (1 init + 3)."""
    import os
    import shutil
    import tempfile
    import uuid

    from ..sources.txtable import TxTable, apply_cdc

    corpus, changes = _cdc_docs_and_changes(spark, sf_dir)
    did = F.col("doc_id")
    root = tempfile.mkdtemp(prefix=f"s9_{uuid.uuid4().hex[:8]}_")
    try:
        t = TxTable(spark, root + "/docs")
        t.init(corpus)
        feed_dir = os.path.join(root, "feed")
        os.makedirs(feed_dir)
        # three files over disjoint doc_id % 9 bands = three micro-batches
        for i, band in enumerate(((0, 1, 2), (3, 4, 5), (6, 7, 8))):
            changes.filter((did % 9).isin(*band)).coalesce(1).write.parquet(
                os.path.join(feed_dir, f"batch_{i}.parquet")
            )
        feed = (
            spark.readStream.schema(changes.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir + "/*")
        )
        q = (
            feed.writeStream.foreachBatch(
                lambda batch, _bid: apply_cdc(t, batch, "doc_id") and None
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.awaitTermination()
        out = (
            t.snapshot()
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("doc_id").cast("long").alias("sum_ids"),
                F.sum(F.length("text")).cast("long").alias("sum_chars"),
                F.sum(
                    F.when(F.col("text").endswith(" [cdc]"), 1).otherwise(0)
                ).cast("long").alias("n_updated"),
            )
            .withColumn("n_versions", F.lit(len(t.versions())).cast("long"))
            .orderBy("lang")
        )
        return out.localCheckpoint(eager=True)  # materialize before rmtree
    finally:
        shutil.rmtree(root, ignore_errors=True)


def s10_streaming_cdc_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC feeding an incrementally-maintained dashboard
    aggregate — the composition of s9 (each micro-batch lands as ONE
    merge commit via apply_cdc) and t68 (mv_refresh advances the MV
    from the manifest change feed): after every batch's merge, the MV
    is refreshed across exactly that commit's version gap (VERDICT r6
    ask #7 — s9 and t68 each prove half of the realistic 'CDC feeds a
    dashboard' pipeline; version-pointer bugs hide in the seam).  The
    gate drains the same 3-band feed as s9 and pins: the MV equals a
    from-scratch recompute of the final base snapshot EXACTLY
    (``incremental_exact``, decimal state compared row-by-row including
    n_rows), one merge commit per batch (base_versions = 4), one
    refresh per batch (mv_versions = 4), and the per-lang measures
    themselves, which the oracle recomputes from raw documents via the
    s9 collapse."""
    import os
    import shutil
    import tempfile
    import uuid

    from ..sources import matview as mvx
    from ..sources.txtable import TxTable, apply_cdc

    corpus, changes = _cdc_docs_and_changes(spark, sf_dir)
    did = F.col("doc_id")
    g = ["lang"]
    measures = {
        "n_docs": "1",
        "sum_ids": "doc_id",
        "sum_chars": "length(text)",
    }
    root = tempfile.mkdtemp(prefix=f"s10_{uuid.uuid4().hex[:8]}_")
    try:
        t = TxTable(spark, root + "/docs")
        t.init(corpus)
        mv = TxTable(spark, root + "/mv")
        mvx.mv_init(mv, t.snapshot(), g, measures)
        state = {"v": t.latest_version()}
        feed_dir = os.path.join(root, "feed")
        os.makedirs(feed_dir)
        for i, band in enumerate(((0, 1, 2), (3, 4, 5), (6, 7, 8))):
            changes.filter((did % 9).isin(*band)).coalesce(1).write.parquet(
                os.path.join(feed_dir, f"batch_{i}.parquet")
            )
        feed = (
            spark.readStream.schema(changes.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir + "/*")
        )

        def apply_and_refresh(batch: DataFrame, _bid: int) -> None:
            apply_cdc(t, batch, "doc_id")
            v_new = t.latest_version()
            if v_new != state["v"]:  # no-op batches refresh nothing
                mvx.mv_refresh(mv, t, g, measures, state["v"], v_new)
                state["v"] = v_new

        q = (
            feed.writeStream.foreachBatch(apply_and_refresh)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .start()
        )
        q.awaitTermination()
        rc = mvx.mv_aggregate(t.snapshot(), g, measures)
        for c in (*measures, "n_rows"):
            rc = rc.withColumnRenamed(c, f"rc_{c}")
        exact = (
            (F.col("n_docs") == F.col("rc_n_docs"))
            & (F.col("sum_ids") == F.col("rc_sum_ids"))
            & (F.col("sum_chars") == F.col("rc_sum_chars"))
            & (F.col("n_rows") == F.col("rc_n_rows"))
        )
        out = (
            mv.snapshot()
            .join(rc, on=g, how="full")
            .select(
                "lang",
                # decimal state, long at the boundary (the t68 rule)
                F.col("n_docs").cast("long").alias("n_docs"),
                F.col("sum_ids").cast("long").alias("sum_ids"),
                F.col("sum_chars").cast("long").alias("sum_chars"),
                exact.alias("incremental_exact"),
            )
            .withColumn(
                "base_versions", F.lit(len(t.versions())).cast("long")
            )
            .withColumn(
                "mv_versions", F.lit(len(mv.versions())).cast("long")
            )
            .orderBy("lang")
        )
        return out.localCheckpoint(eager=True)  # materialize before rmtree
    finally:
        shutil.rmtree(root, ignore_errors=True)


def s17_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join gate — the one Structured Streaming
    join family the s-suite lacked.  Drains
    streaming/ingest.attribute_stream: click→purchase attribution per
    user within a 30-minute horizon, with watermarks on BOTH sides and
    a time-range join condition, the pair that lets Spark evict join
    state once an input is older than watermark+horizon (state is
    O(arrival rate × horizon) at scale, never O(stream)).  The
    availableNow drain loads the corpus as one micro-batch, so the
    watermark cannot discard anything as late and the appended matches
    equal the batch interval join exactly — which the oracle replays
    as a DuckDB self-join.  The same plan runs continuously against
    Kafka in production; pytest pins the stream==batch equality
    independently (test_streaming.test_attribute_stream_matches_batch_
    interval_join)."""
    import os
    import uuid

    from ..streaming import ingest as st

    ev = st.stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    pairs = st.attribute_stream(ev)  # cause=click, effect=purchase, 30 min
    name = "s17_attrib_" + uuid.uuid4().hex[:8]
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.table(name)
        .select(
            "user_id", "cause_id", "effect_id",
            "cause_ts", "effect_ts", "value",
        )
        .orderBy("user_id", "cause_id", "effect_id")
        .localCheckpoint(eager=True)  # materialize before dropping the sink
    )
    spark.catalog.dropTempView(name)
    return result


def s18_streaming_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment gate
    (streaming/ingest.enrich_stream — the streaming twin of the
    warehouse star join J1/J2): the events stream left-joins the
    static customer dimension per micro-batch with a broadcast hash
    join and ZERO streaming state (the static side is re-resolved each
    batch, so a dimension refresh is picked up mid-stream at scale).
    The availableNow drain appends every enriched event; the gate
    rolls them up per market segment with decimal-exact value sums —
    NULL segment = events whose user has no customer row, kept by the
    left join — and the oracle replays the whole thing as a DuckDB
    batch join."""
    import os
    import uuid

    from ..streaming import ingest as st

    ev = st.stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = st.enrich_stream(ev, dim, "user_id")
    name = "s18_enrich_" + uuid.uuid4().hex[:8]
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = (
        spark.table(name)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            r2(dsum(F.col("value"))).alias("total_value"),
        )
        .orderBy("c_mktsegment")
        .localCheckpoint(eager=True)  # materialize before dropping the sink
    )
    spark.catalog.dropTempView(name)
    return result

def s19_streaming_outer_interval_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT OUTER stream-stream interval join gate
    (streaming/ingest.attribute_stream_outer — VERDICT r9 next #5):
    click→purchase attribution that ALSO emits every unattributed
    click, null-padded, once the watermark proves no purchase can
    still arrive.

    Drain protocol: the real corpus replays as micro-batch 1; a
    far-future click+purchase sentinel pair (user_id < 0, max(ts) +
    10 days) replays as micro-batch 2, driving the final watermark
    past every real click's (cause_ts + horizon) so ALL real unmatched
    state evicts and appends before the availableNow drain terminates
    — making the emitted set equal the plain batch left join the
    DuckDB oracle runs (no eviction-cutoff bookkeeping left in the
    result).  The sentinels themselves stay in state (the watermark
    never passes them) and are excluded by the user_id >= 0 guard.
    The unmatched-only-after-watermark emission ORDER is pinned in
    tests/test_streaming.py."""
    import datetime as _dt
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming import ingest as st

    events = table(spark, sf_dir, "events")
    hi = events.agg(F.max("ts")).collect()[0][0]
    far = hi + _dt.timedelta(days=10)
    base = tempfile.mkdtemp(prefix=f"s19_{uuid.uuid4().hex[:8]}_")
    name = "s19_outer_" + uuid.uuid4().hex[:8]
    try:
        src = os.path.join(base, "ev")
        sent = spark.createDataFrame(
            [
                (-1, far, -1, "click", None, None),
                (-2, far, -2, "purchase", None, None),
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        for fname, part, mtime in (
            ("f1.parquet", events, 1000),
            ("f2.parquet", sent, 2000),
        ):
            p = os.path.join(src, fname)
            part.coalesce(1).write.parquet(p)
            for root, _, fs in os.walk(p):
                for f in fs:
                    os.utime(os.path.join(root, f), (mtime, mtime))
        raw = (
            spark.readStream.schema(st.EVENTS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        ev = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        pairs = st.attribute_stream_outer(ev)
        q = (
            pairs.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.table(name)
            .filter(F.col("user_id") >= 0)
            .select(
                "user_id", "cause_id", "cause_ts",
                "effect_id", "effect_ts", "value",
            )
            .orderBy(
                "user_id", "cause_id",
                F.coalesce(F.col("effect_id"), F.lit(-1)),
            )
            .localCheckpoint(eager=True)  # materialize before dropping
        )
        spark.catalog.dropTempView(name)
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)


def s20_streaming_multihop_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONTINUOUS MULTI-HOP LAKEHOUSE PIPELINE (VERDICT r10 next #7):
    bronze -> silver -> gold chained end-to-end through the TxTable
    change-feed streaming source, with keyed idempotent application
    and auto-compaction at each hop — the composition all the pieces
    exist for (s16 one hop, s9/s10 CDC apply + MV refresh) but no
    single gate proved.

    - BRONZE: raw documents TxTable fed in four commits
      (init %3==0 / append %3==1 / delete %7==0 / append %3==2).
    - SILVER (hop 1): stream_table_changes(bronze) -> foreachBatch
      derives CDC events (insert beats delete within a version;
      later versions win via the sequence key) and applies them with
      apply_cdc — a curation hop: only even-n_chars rows pass, plus a
      derived column.  After every batch the hop runs optimize_small:
      auto-compaction whose 'optimize' commits the downstream feed
      must NOT see (data-preserving ops are skipped).
    - GOLD (hop 2): stream_table_changes(silver) -> foreachBatch
      maintains a per-source aggregate MV via mv_apply_changes (the
      streaming twin of mv_refresh) — merge rewrites' delete+reinsert
      pairs cancel in the signed aggregation.

    The chain is drained after each bronze stage (three drains), then
    once more to pin ``restart_noop``.  Pins: gold equals a
    from-scratch aggregate of silver (``chain_exact``), silver equals
    the batch transform of final bronze (``silver_matches_batch``),
    silver auto-compaction actually fired and stayed invisible
    downstream (``silver_autocompacted`` + the equality pins), and the
    per-source measures themselves, which the oracle recomputes from
    raw documents."""
    import shutil
    import tempfile
    import uuid as _uuid

    from ..sources.matview import mv_apply_changes, mv_aggregate, mv_init
    from ..sources.txstream import stream_table_changes
    from ..sources.txtable import TxTable, apply_cdc

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = tempfile.mkdtemp(prefix=f"s20_{_uuid.uuid4().hex[:8]}_")
    g = ["source"]
    measures = {
        "n_docs": "1",
        "sum_chars": "n_chars",
        "sum_twice": "twice_chars",
    }
    try:
        bronze = TxTable(spark, base + "/bronze")
        silver = TxTable(spark, base + "/silver")
        gold = TxTable(spark, base + "/gold")
        silver.init(
            spark.createDataFrame(
                [],
                "doc_id long, source string, n_chars long, "
                "twice_chars long",
            )
        )
        mv_init(gold, silver.snapshot(), g, measures)

        def hop1(batch: DataFrame, _bid: int) -> None:
            ch = batch.select(
                "doc_id",
                "source",
                "n_chars",
                (F.col("n_chars") * 2).alias("twice_chars"),
                F.when(F.col("_change_type") == "delete", "D")
                .otherwise("U")
                .alias("op"),
                (
                    F.col("_commit_version") * 2
                    + (F.col("_change_type") == "insert").cast("long")
                ).alias("seq"),
            ).filter(
                # curation predicate: an insert failing it was never
                # silver's row (bronze rows are immutable), so drop it;
                # deletes pass through (an unmatched delete is a no-op)
                (F.col("op") == "D") | (F.col("n_chars") % 2 == 0)
            )
            if ch.isEmpty():
                return
            apply_cdc(silver, ch, "doc_id")
            # hop-local auto-compaction: 'optimize' commits are
            # data-preserving, so hop 2's feed skips them
            silver.optimize_small(1 << 20)

        def hop2(batch: DataFrame, _bid: int) -> None:
            if batch.isEmpty():
                return
            mv_apply_changes(gold, batch, g, measures)

        def drain() -> None:
            for path, fn, ck in (
                (base + "/bronze", hop1, base + "/ckpt1"),
                (base + "/silver", hop2, base + "/ckpt2"),
            ):
                q = (
                    stream_table_changes(spark, path)
                    .writeStream.foreachBatch(fn)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

        did = F.col("doc_id")
        bronze.init(docs.filter(did % 3 == 0).coalesce(2))
        bronze.append(docs.filter(did % 3 == 1).coalesce(1))
        drain()
        bronze.delete(did % 7 == 0)
        drain()
        bronze.append(docs.filter(did % 3 == 2).coalesce(1))
        drain()
        v_s, v_g = silver.latest_version(), gold.latest_version()
        drain()  # restart on the same checkpoints: nothing new
        restart_noop = (
            silver.latest_version() == v_s and gold.latest_version() == v_g
        )
        silver_autocompacted = any(
            h["op"] == "optimize" for h in silver.history()
        )
        # silver == the batch transform of FINAL bronze
        want_silver = (
            bronze.snapshot()
            .filter(F.col("n_chars") % 2 == 0)
            .select(
                "doc_id",
                "source",
                "n_chars",
                (F.col("n_chars") * 2).alias("twice_chars"),
            )
        )
        got_silver = silver.snapshot().select(
            "doc_id", "source", "n_chars", "twice_chars"
        )
        silver_matches_batch = (
            got_silver.exceptAll(want_silver).isEmpty()
            and want_silver.exceptAll(got_silver).isEmpty()
        )
        # gold == from-scratch aggregate of silver (decimal state,
        # n_rows included)
        rc = mv_aggregate(got_silver, g, measures)
        gold_state = gold.snapshot().select(rc.columns)
        chain_exact = (
            gold_state.exceptAll(rc).isEmpty()
            and rc.exceptAll(gold_state).isEmpty()
        )
        return (
            gold.snapshot()
            .select(
                "source",
                F.col("n_docs").cast("long").alias("n_docs"),
                F.col("sum_chars").cast("long").alias("sum_chars"),
                F.col("sum_twice").cast("long").alias("sum_twice"),
            )
            .withColumn("bronze_versions", F.lit(4).cast("long"))
            .withColumn("silver_matches_batch", F.lit(silver_matches_batch))
            .withColumn("chain_exact", F.lit(chain_exact))
            .withColumn("restart_noop", F.lit(restart_noop))
            .withColumn(
                "silver_autocompacted", F.lit(silver_autocompacted)
            )
            .orderBy("source")
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
