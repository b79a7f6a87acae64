"""Deduplication operators for LLM training-data pipelines.

Five families, each designed scale-first (shuffle keys stated per op):

- exact:        hash-groupBy on a content fingerprint (1 shuffle on the
                16-byte digest — the only correct exact dedup at 100 TB;
                never a pairwise compare).
- n-gram Jaccard: shingle → explode → self-join on shingle → pair counts.
                Hot (stopword-like) shingles are capped by document
                frequency before the join, which bounds the worst-case
                join fan-out at scale (a shingle appearing in f docs
                contributes f² pairs).
- MinHash+LSH:  per-doc signature of `num_perm` seeded xxhash64 minima,
                banded; candidate pairs join only within (band, bandhash)
                buckets — O(candidates), not O(n²) — then are verified
                with the true Jaccard.
- SimHash:      64-bit sign-vote fingerprint over token hashes; candidate
                pairs via 4x16-bit chunk blocking, verified by Hamming
                distance.  Pure column expressions, no UDFs.
- embedding near-dup lives in operators/similarity.py (cosine ≥ τ pairs).

All hashing uses Spark's built-in xxhash64 with explicit integer seeds —
deterministic across runs and cluster sizes, JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import content_fingerprint, norm_text, tokens


# --------------------------------------------------------------- exact dedup

def exact_duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group documents by exact normalized-content fingerprint.

    Returns (fingerprint, n_docs, keep_id) — keep_id is the minimum id, the
    canonical survivor.  One shuffle on the digest; group sizes are tiny so
    no skew handling is needed.
    """
    return (
        df.select(
            content_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("id"),
        )
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_id"))
    )


def drop_exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one survivor per fingerprint group (the min-id row)."""
    keep = exact_duplicate_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ----------------------------------------------------------------- shingling

def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Documents shorter than n tokens contribute their whole normalized text
    as a single shingle so they still participate in dedup.
    """
    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(norm_text(F.col(text_col))))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def shingle_array(text_col: Column, n: int = 2) -> Column:
    """The distinct word-n-gram shingle SET of one document as an array
    column — the per-row (stateless, streaming-safe) form of
    shingle_table: explode(shingle_array) ≡ shingle_table's rows, and
    min/intersect over the array equal the grouped forms."""
    toks = tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(norm_text(text_col)))
    return F.array_distinct(grams)


# ------------------------------------------------------------ n-gram Jaccard

def jaccard_pairs(
    shingled: DataFrame,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity ≥ threshold.

    shingled: output of shingle_table (distinct (id, shingle)).
    max_doc_freq: drop shingles appearing in more than this many documents
    before pairing — the scale lever that bounds join fan-out (df² pairs
    per hot shingle).  Set from corpus size; None disables.

    Jaccard uses set sizes from BEFORE the frequency cap, so the cap only
    *under*-reports similarity (candidate loss), never inflates it.
    """
    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    paired = shingled
    if max_doc_freq is not None:
        hot = (
            shingled.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        paired = shingled.join(hot, "shingle", "left_anti")

    a, b = paired.alias("a"), paired.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- MinHash LSH

def minhash_signatures(shingled: DataFrame, num_perm: int = 32) -> DataFrame:
    """Per-doc MinHash signature: min over shingles of xxhash64(shingle, i)
    for each of num_perm seeded hash functions.  One shuffle on id."""
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    return shingled.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_perm: int = 32, bands: int = 8
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band bucket.

    With r = num_perm/bands rows per band, the usual S-curve applies:
    P(candidate) = 1 - (1 - j^r)^bands for true Jaccard j.  Join work is
    proportional to bucket sizes, never all-pairs.
    """
    r = num_perm // bands
    assert bands * r == num_perm, "num_perm must be divisible by bands"
    # ONE pass: explode a per-row array of (band, bucket) structs instead
    # of a bands-way unionAll of per-band projections — the union shape
    # duplicated the whole upstream signature subtree per band (t8's plan
    # was 685 operators / 206 Exchanges; the map work was re-executed or
    # at best re-planned per band), where a Generate over the same rows
    # is a single subtree (guide §2.4: remove duplicated subtrees).
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{bnd * r + j}") for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select("id", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup: candidates from LSH buckets,
    verified with the true Jaccard on the candidates only.

    Verification work is restricted to documents that appear in at least
    one candidate pair (left_semi) BEFORE the pairwise shingle join — this
    is what keeps the verify stage O(candidates), not O(corpus²)."""
    shingled = shingle_table(df, id_col, text_col, n)
    cands = lsh_candidate_pairs(minhash_signatures(shingled, num_perm), num_perm, bands)
    cand_ids = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    )
    cand_shingles = shingled.join(cand_ids, "id", "left_semi")
    verified = jaccard_pairs(cand_shingles, threshold=threshold)
    return cands.join(verified, ["id_a", "id_b"], "inner")


# ------------------------------------- MinHash LSH (engine-portable hashes)

MINHASH_P = 4_294_967_311  # smallest prime > 2^32


def minhash_coeffs(num_perm: int = 32) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for the modular permutation family
    h_i(x) = (a_i·x + b_i) mod p.  Emitted as literals into both the Spark
    plan and the DuckDB oracle SQL, so the two engines run the *same*
    arithmetic.  a < 2^31 and x < 2^32 keep a·x + b below 2^63 — plain
    BIGINT in any engine, no overflow."""
    return [
        (
            (1103515245 * (i + 1) + 12345) % 2147483647 + 1,
            (69069 * (i + 1) + 1) % MINHASH_P,
        )
        for i in range(num_perm)
    ]


def md5_hash32(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT — the one hash both
    Spark and DuckDB compute identically (xxhash64's seeded variant exists
    only JVM-side, which is why t8 has no SQL oracle)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_md5_signatures(shingled: DataFrame, num_perm: int = 32) -> DataFrame:
    """Per-doc portable MinHash signature (id, mh0..mh{n-1}): min over
    shingles of the literal modular permutations from minhash_coeffs
    applied to the md5-prefix shingle hash.  One shuffle on id.  Pure
    per-doc state — a document's signature never depends on the rest of
    the corpus, which is what makes signatures PERSISTABLE and the
    incremental (delta-vs-corpus) dedup below possible."""
    hv = md5_hash32(F.col("shingle"))
    return shingled.groupBy("id").agg(
        *[
            F.min((F.lit(a).cast("long") * hv + F.lit(b)) % F.lit(MINHASH_P)).alias(
                f"mh{i}"
            )
            for i, (a, b) in enumerate(minhash_coeffs(num_perm))
        ]
    )


def md5_band_table(sig: DataFrame, num_perm: int = 32, bands: int = 8) -> DataFrame:
    """Band a portable signature into (id, band, bkey) bucket rows — the
    LSH index relation.  Persist this (bucketed by bkey) to make the
    corpus side of incremental dedup a zero-rehash, zero-shuffle scan."""
    r = num_perm // bands
    assert bands * r == num_perm, "num_perm must be divisible by bands"
    # ONE pass (same rewrite as lsh_candidate_pairs): a per-row explode of
    # (band, bkey) structs replaces the bands-way unionAll that duplicated
    # the signature-aggregation subtree per band in every consumer's plan.
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[F.col(f"mh{bnd * r + j}") for j in range(r)],
                            )
                        ).alias("bkey"),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select("id", F.col("_bb.band").alias("band"), F.col("_bb.bkey").alias("bkey"))


def _verify_jaccard(
    cands: DataFrame, shingled: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification restricted to candidate pairs:
    O(candidates) work, shingle join keyed on (id, shingle)."""
    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    sa, sb = shingled.alias("sa"), shingled.alias("sb")
    inter = (
        cands.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(
            sb,
            (F.col("id_b") == F.col("sb.id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_md5_pairs(
    shingled: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.35,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with engine-portable hashing.

    Same S-curve and join discipline as minhash_signatures/
    lsh_candidate_pairs, but every hash is md5-derived with literal modular
    permutations (minhash_coeffs), so a DuckDB oracle replays the whole
    pipeline — signature, banding, candidate generation, verification —
    bit-for-bit.  Returns (id_a, id_b, jaccard) for candidate pairs whose
    exact Jaccard (computed only over candidates, O(candidates) work)
    meets the threshold.
    """
    sig = minhash_md5_signatures(shingled, num_perm)
    banded = md5_band_table(sig, num_perm, bands)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(cands, shingled, threshold)


def rowwise_md5_bands(
    shingles: Column, num_perm: int = 32, bands: int = 8
) -> Column:
    """Per-ROW portable MinHash banding: given a document's shingle-set
    array, return an array of (band, bkey) structs — no aggregation, no
    shuffle, no state.  min over the array equals the grouped min of
    minhash_md5_signatures, so the band keys are identical to the
    persisted index's; this is what lets a STREAMING pipeline band
    incoming documents statelessly and join them against the stored
    corpus index (streaming/ingest.neardup_stream)."""
    r = num_perm // bands
    assert bands * r == num_perm, "num_perm must be divisible by bands"
    coeffs = minhash_coeffs(num_perm)

    def perm(a: int, b: int):
        # closure factory: F.transform dispatches on lambda ARITY (a
        # 2-arg lambda receives (element, index)), so coefficients must
        # be captured without adding parameters
        return lambda s: (
            F.lit(a).cast("long") * md5_hash32(s) + F.lit(b)
        ) % F.lit(MINHASH_P)

    mins = [
        F.array_min(F.transform(shingles, perm(a, b))) for a, b in coeffs
    ]
    return F.array(
        *[
            F.struct(
                F.lit(bnd).alias("band"),
                F.md5(
                    F.concat_ws(",", *[mins[bnd * r + j] for j in range(r)])
                ).alias("bkey"),
            )
            for bnd in range(bands)
        ]
    )


def minhash_incremental_pairs(
    corpus_bands: DataFrame,
    delta_shingled: DataFrame,
    corpus_shingled: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.35,
) -> DataFrame:
    """Cross-run incremental near-dedup: pair a NEW batch (delta) against
    an EXISTING corpus without ever re-pairing the corpus with itself.

    ``corpus_bands`` and ``corpus_shingled`` are the PERSISTED state of
    prior runs: the (id, band, bkey) index from md5_band_table and the
    exploded (id, shingle) relation, ideally stored bucketed (by bkey
    and id respectively, sources.registry.write_bucketed) so reading
    them back plans no Exchange on the corpus side of either join.
    Persisting the shingle relation matters for the cost claim: the
    candidate-id semi join cannot push below shingle_table's
    explode+distinct, so recomputing it from raw text would re-tokenize
    the whole corpus each batch — reading the stored relation back makes
    the verification a scan+join with zero re-hashing (the gate-scale
    t31 recomputes both in-process as a stand-in; the bucketed
    round-trip is tests/test_dedup.py's production shape).
    ``delta_shingled`` covers only the new documents.

    The candidate join is delta_bands ⋈ (corpus_bands ∪ delta_bands):
    every emitted pair contains ≥1 delta document by construction —
    corpus×corpus pairs are structurally impossible, which is the whole
    point (per-batch compute is O(|delta| + candidates)).  Because
    signatures and band keys are pure per-document functions, the result
    equals the full-corpus minhash_md5_pairs output restricted to pairs
    touching the delta — an equivalence the t31 oracle checks
    cross-engine.

    After a run, append the delta's band AND shingle rows to the
    persisted stores to absorb the batch into the corpus.
    """
    delta_bands = md5_band_table(
        minhash_md5_signatures(delta_shingled, num_perm), num_perm, bands
    )
    every = corpus_bands.select("id", "band", "bkey").unionAll(
        delta_bands.select("id", "band", "bkey")
    )
    d, o = delta_bands.alias("d"), every.alias("o")
    cands = (
        d.join(
            o,
            (F.col("d.band") == F.col("o.band"))
            & (F.col("d.bkey") == F.col("o.bkey"))
            & (F.col("d.id") != F.col("o.id")),
        )
        .select(
            F.least(F.col("d.id"), F.col("o.id")).alias("id_a"),
            F.greatest(F.col("d.id"), F.col("o.id")).alias("id_b"),
        )
        .distinct()
    )
    cand_ids = cands.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    verify_shingles = (
        corpus_shingled.select("id", "shingle")
        .unionAll(delta_shingled.select("id", "shingle"))
        .join(cand_ids, "id", "left_semi")
    )
    return _verify_jaccard(cands, verify_shingles, threshold)


# ------------------------------------------------------------------ SimHash

def simhash_sql(text_sql: str) -> str:
    """64-bit SimHash as one SQL higher-order expression (bit shifts by a
    lambda-bound variable are only expressible in SQL, not the pyspark
    column API).  Single pass over the token array: accumulate a 64-wide
    ±1 vote vector, then fold the vote signs into a BIGINT fingerprint."""
    hashes = (
        f"transform(split(regexp_replace(lower(trim({text_sql})), '\\\\s+', ' '), ' '), "
        "t -> xxhash64(t))"
    )
    votes = (
        f"aggregate({hashes}, transform(sequence(0, 63), b -> 0), "
        "(acc, h) -> zip_with(acc, "
        "transform(sequence(0, 63), b -> CAST(shiftright(h, b) & 1 AS INT) * 2 - 1), "
        "(x, y) -> x + y))"
    )
    return (
        f"aggregate(zip_with({votes}, sequence(0, 63), "
        "(v, b) -> IF(v > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))), "
        "CAST(0 AS BIGINT), (acc, x) -> acc | x)"
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sim) — 64-bit SimHash fingerprint per document."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text__"),
    ).select("id", F.expr(simhash_sql("__text__")).alias("sim"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def _chunk_rows(
    sh: DataFrame, n_chunks: int, width: int, mask: int
) -> DataFrame:
    """(id, sim, chunk, key) blocking rows from a (id, sim) signature —
    one explode over a per-row struct array (the md5_band_table shape);
    the previous per-chunk unionAll duplicated the whole signature
    subtree once per chunk on BOTH sides of the candidate self-join
    (t9's plan re-scanned the corpus 32 times)."""
    return sh.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("sim"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("_ck"),
    ).select("id", "sim", F.col("_ck.chunk").alias("chunk"), F.col("_ck.key").alias("key"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on equal bit-chunks, then verify
    exact Hamming distance.  Pigeonhole: a pair within Hamming ≤ h must
    agree on ≥1 of n chunks whenever n > h, so the chunk count is derived
    from max_hamming (4x16-bit for h≤3, 8x8-bit for h≤7, 16x4-bit for
    h≤15) — recall is exact, and blocking keeps the join linear in bucket
    sizes at scale."""
    if max_hamming <= 3:
        n_chunks = 4
    elif max_hamming <= 7:
        n_chunks = 8
    elif max_hamming <= 15:
        n_chunks = 16
    else:
        raise ValueError("max_hamming > 15 defeats chunk blocking; use a different operator")
    width = 64 // n_chunks
    mask = (1 << width) - 1
    sh = simhash64(df, id_col, text_col)
    chunks = _chunk_rows(sh, n_chunks, width, mask)
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------- SimHash (engine-portable md5 variant)

SIMHASH_MD5_BITS = 48  # 12 hex chars of md5 — fits signed BIGINT in any engine


def simhash_md5_sql(text_sql: str) -> str:
    """48-bit SimHash with md5-derived token hashes — t9's xxhash64
    fingerprints exist only JVM-side, so its gate is rows-only; this
    variant uses the one hash Spark and DuckDB compute identically
    (md5 hex prefix → integer, same trick as minhash_md5_pairs), making
    the whole vote-and-sign pipeline oracle-replayable bit-for-bit.
    48 bits (not 64) because '0x'+hex→BIGINT parsing is signed in DuckDB;
    12 hex chars keep every intermediate below 2^63 in both engines."""
    bits = SIMHASH_MD5_BITS
    hashes = (
        f"transform(split(regexp_replace(lower(trim({text_sql})), '\\\\s+', ' '), ' '), "
        "t -> CAST(conv(substring(md5(t), 1, 12), 16, 10) AS BIGINT))"
    )
    votes = (
        f"aggregate({hashes}, transform(sequence(0, {bits - 1}), b -> 0), "
        "(acc, h) -> zip_with(acc, "
        f"transform(sequence(0, {bits - 1}), b -> CAST(shiftright(h, b) & 1 AS INT) * 2 - 1), "
        "(x, y) -> x + y))"
    )
    return (
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
        "(v, b) -> IF(v > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))), "
        "CAST(0 AS BIGINT), (acc, x) -> acc | x)"
    )


def simhash_md5_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by portable 48-bit SimHash: block on equal 12-bit
    chunks (4 chunks > max_hamming=3 → pigeonhole guarantees exact
    recall), verify exact Hamming.  Same plan shape as simhash_pairs —
    the candidate join stays linear in bucket sizes at scale."""
    if max_hamming > 3:
        raise ValueError("portable variant blocks on 4 chunks; max_hamming <= 3")
    n_chunks = 4
    width = SIMHASH_MD5_BITS // n_chunks
    mask = (1 << width) - 1
    sh = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text__")
    ).select("id", F.expr(simhash_md5_sql("__text__")).alias("sim"))
    chunks = _chunk_rows(sh, n_chunks, width, mask)
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------- winnowing

def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    MOSS algorithm): hash every k-char gram of the normalized text, keep
    the minimum hash of each sliding window of `window` grams.  The
    selected set is position-robust: any sufficiently long shared
    substring yields shared fingerprints, unlike whole-document hashes.

    Pure SQL higher-order expressions over xxhash64 — per-row compute,
    no shuffle; output exploded as (id, fingerprint) distinct, ready for
    the same bucket-join dedup shape as shingles.

    portable=True swaps xxhash64 for the md5-prefix hash (md5_hash32) so
    a DuckDB oracle can replay the gram→window-min selection exactly.
    """
    gram_hash = (
        f"CAST(conv(substring(md5(substring(_norm, i, {k})), 1, 8), 16, 10) AS BIGINT)"
        if portable
        else f"xxhash64(substring(_norm, i, {k}))"
    )
    grams = (
        f"transform(sequence(1, greatest(length(_norm) - {k} + 1, 1)), "
        f"i -> {gram_hash})"
    )
    mins = (
        f"transform(sequence(1, greatest(size(_grams) - {window} + 1, 1)), "
        f"i -> array_min(slice(_grams, i, {window})))"
    )
    normed = df.select(
        F.col(id_col).alias("id"),
        norm_text(F.col(text_col)).alias("_norm"),
    ).select("id", F.expr(grams).alias("_grams"))
    return (
        normed.select("id", F.explode(F.expr(mins)).alias("fingerprint"))
        .distinct()
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    min_shared: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Near-dup candidates by shared winnowed fingerprints (id_a, id_b,
    shared_fingerprints) — the containment-style complement to Jaccard
    shingle dedup (robust to partial overlap/plagiarism-shaped reuse)."""
    fp = winnow_fingerprints(df, id_col, text_col, k, window, portable=portable)
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


# ----------------------------------------- segment-level cross-doc dedup

SEGMENT_TOKENS = 16


def segment_table(
    df: DataFrame, id_col: str, text_col: str, seg_tokens: int = SEGMENT_TOKENS
) -> DataFrame:
    """(id, seg_id, segment): non-overlapping ``seg_tokens``-token
    segments per document — the unit of RefinedWeb/CCNet-style partial
    dedup, where boilerplate REGIONS repeated across documents are
    removed while the unique remainder survives.  (Real web corpora
    segment on newlines; the synthetic corpus has none, so fixed token
    windows play the role of lines — the relational shape downstream is
    identical.)  Pure per-row plan arithmetic: higher-order slice +
    posexplode, no shuffle, no Python."""
    toks = tokens(F.col(text_col))
    ns = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), ns - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * seg_tokens + 1, seg_tokens)),
    )
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(segs).alias("seg_id", "segment")
    )


def _segment_rollup(marked: DataFrame) -> DataFrame:
    """Shared per-document reassembly for the full and incremental
    segment-dedup paths: from (id, seg_id, segment, _drop NULL|true)
    rows, the segment/drop counts and the md5 of the surviving segments
    rejoined in order (md5('') when everything was boilerplate).  One
    helper on purpose — the t41/t46 oracles pin the two paths EQUAL, so
    the reassembly must not be able to drift between them."""
    return (
        marked.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.when(F.col("_drop"), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_drop").isNull(),
                                    F.struct("seg_id", "segment"),
                                )
                            )
                        ),
                        lambda s: s["segment"],
                    ),
                )
            ).alias("clean_md5"),
        )
    )


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int = SEGMENT_TOKENS,
    max_docs: int = 1,
) -> DataFrame:
    """Corpus-level segment dedup: a segment whose exact hash occurs in
    more than ``max_docs`` DISTINCT documents is boilerplate — drop it
    from every document and reassemble the remainder.

    Returns (id, n_segments, n_dropped, clean_md5) where clean_md5
    hashes the surviving segments re-joined in order (empty string when
    every segment was boilerplate), so one wrongly kept/dropped segment
    fails the gate hash.

    Scale: one shuffle keyed on the segment digest for the document-
    frequency count, a join of segments against the (small — only
    repeated segments survive the HAVING) boilerplate set that AQE can
    broadcast, then one shuffle on id for the reassembly — never a
    pairwise document compare.  At 100 TB the boilerplate table is the
    interesting knob: its size is bounded by the number of DISTINCT
    repeated segments, orders of magnitude below corpus segments.
    """
    segs = segment_table(df, id_col, text_col, seg_tokens)
    hashed = segs.withColumn("seg_md5", F.md5(F.col("segment")))
    boiler = (
        hashed.groupBy("seg_md5")
        .agg(F.count_distinct("id").alias("df_docs"))
        .filter(F.col("df_docs") > max_docs)
        .select("seg_md5")
    )
    marked = hashed.join(
        boiler.withColumn("_drop", F.lit(True)), "seg_md5", "left"
    )
    return _segment_rollup(marked)


# -------------------------------------------------- Bloom membership filter

BLOOM_BITS = 1 << 18  # m: filter size in bits (config constant)
BLOOM_HASHES = 4      # k: probes per key


def bloom_bits(fingerprint: Column) -> Column:
    """The ``BLOOM_HASHES`` bit positions of one content fingerprint:
    independent 32-bit slices of its md5, each mod m — the standard
    partitioned-Bloom construction, engine-portable (DuckDB replays the
    same substring/conv arithmetic)."""
    return F.array(
        *[
            F.conv(F.substring(F.md5(fingerprint), 1 + 8 * j, 8), 16, 10)
            .cast("long")
            % F.lit(BLOOM_BITS)
            for j in range(BLOOM_HASHES)
        ]
    )


def bloom_bit_table(df: DataFrame, text_col: str) -> DataFrame:
    """The corpus's Bloom filter as a relation: the DISTINCT set bits
    over every document's normalized-content fingerprint.  At most m
    rows by construction — bounded by the CONFIGURED filter size, never
    by corpus size, so it broadcasts no matter how many documents set
    the bits (the relational twin of a 32 KiB bitmap at these
    constants).  Persist it (parquet/txtable) and a later ingest batch
    screens against it without touching corpus data."""
    return (
        df.select(F.explode(bloom_bits(norm_text(F.col(text_col)))).alias("bit"))
        .distinct()
    )


def bloom_screen(
    delta: DataFrame, id_col: str, text_col: str, bits: DataFrame
) -> DataFrame:
    """Membership-screen a new batch against a corpus Bloom relation:
    (id, n_hits, maybe_dup) — maybe_dup iff ALL k probed bits are set
    (the Bloom 'possibly present' verdict; false positives possible at
    the configured m/k/n rate, false negatives impossible, the property
    the t43 gate proves against exact membership).

    Scale: per-delta cost is k probes joined against the broadcast bit
    relation — the cheap first stage in front of exact/MinHash dedup,
    filtering the (typical) mostly-novel batch down to probable dups
    before any heavy comparison."""
    probes = delta.select(
        F.col(id_col).alias("id"),
        F.explode(bloom_bits(norm_text(F.col(text_col)))).alias("bit"),
    )
    hits = probes.join(
        F.broadcast(bits.withColumn("_set", F.lit(True))), "bit", "left"
    )
    return (
        hits.groupBy("id")
        .agg(F.sum(F.when(F.col("_set"), 1).otherwise(0)).cast("long").alias("n_hits"))
        .withColumn("maybe_dup", F.col("n_hits") == F.lit(BLOOM_HASHES))
    )


def segment_counts(
    df: DataFrame, id_col: str, text_col: str, seg_tokens: int = SEGMENT_TOKENS
) -> DataFrame:
    """(seg_md5, df_docs): the corpus segment-frequency store — the
    PERSISTED state of cross-run segment dedup, bounded by distinct
    segments (store it bucketed by seg_md5 so incremental joins plan no
    Exchange on the corpus side)."""
    return (
        segment_table(df, id_col, text_col, seg_tokens)
        .select("id", F.md5(F.col("segment")).alias("seg_md5"))
        .groupBy("seg_md5")
        .agg(F.count_distinct("id").alias("df_docs"))
    )


def segment_dedup_incremental(
    corpus_counts: DataFrame,
    delta: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int = SEGMENT_TOKENS,
    max_docs: int = 1,
) -> DataFrame:
    """Cross-run segment dedup: clean a NEW batch against the persisted
    corpus segment-frequency store without re-reading corpus text — the
    t41 analog of t31's incremental MinHash contract.

    A delta segment is boilerplate when its corpus document frequency
    plus its delta document frequency exceeds ``max_docs``; because
    delta ids are new by construction the sum IS the corpus∪delta
    distinct-document count, so the result equals the full-corpus
    recompute restricted to delta documents (the t46 oracle proves this
    cross-engine).  Per-batch cost is O(|delta segments| + store
    lookups); corpus text is never touched.  After a run, merge the
    delta's (seg_md5, df_docs) rows into the store (sum on collision)
    to absorb the batch."""
    segs = segment_table(delta, id_col, text_col, seg_tokens).withColumn(
        "seg_md5", F.md5(F.col("segment"))
    )
    delta_counts = segs.groupBy("seg_md5").agg(
        F.count_distinct("id").alias("delta_docs")
    )
    boiler = (
        delta_counts.join(corpus_counts, "seg_md5", "left")
        .filter(
            F.col("delta_docs") + F.coalesce(F.col("df_docs"), F.lit(0))
            > max_docs
        )
        .select("seg_md5")
    )
    marked = segs.join(boiler.withColumn("_drop", F.lit(True)), "seg_md5", "left")
    return _segment_rollup(marked)


# ------------------------------------- takedown cascade for dedup stores

def index_delete_ids(
    store: DataFrame, deleted_ids: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Remove a deleted document set from any per-document index
    relation — MinHash band tables (id, band, bkey), SRP band tables
    (id, band, key), shingle relations (id, shingle), signature or
    fingerprint stores — via one left-anti join on the id.  Works for
    every store whose rows are pure per-document state (which is exactly
    what makes them persistable in the first place): dropping a doc's
    rows leaves every other doc's rows valid, so the result equals the
    store rebuilt from the surviving corpus.  O(|store| + |deleted|),
    anti-join broadcastable for takedown-sized delete sets; corpus text
    is never touched."""
    ids = deleted_ids.select(F.col(deleted_ids.columns[0]).alias(id_col))
    return store.join(ids, id_col, "left_anti")


def segment_counts_subtract(
    corpus_counts: DataFrame,
    deleted: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int = SEGMENT_TOKENS,
) -> DataFrame:
    """Remove deleted documents from a persisted segment-frequency store
    (:func:`segment_counts`) WITHOUT re-reading the surviving corpus:
    the deleted docs' own per-segment distinct-doc counts are recomputed
    (O(|deleted|) text) and subtracted; segments whose count reaches 0
    disappear.  Exact because doc ids are unique contributors to a
    distinct-doc count — the store after subtraction equals
    segment_counts(corpus minus deleted), the equality gate t56 proves
    cross-engine.  Without this cascade, deleted documents ghost in the
    store and keep suppressing segments they alone made 'boilerplate'
    (the takedown gap VERDICT r4 flagged)."""
    neg = segment_counts(deleted, id_col, text_col, seg_tokens).select(
        "seg_md5", F.col("df_docs").alias("_neg")
    )
    return (
        corpus_counts.join(neg, "seg_md5", "left")
        .select(
            "seg_md5",
            (F.col("df_docs") - F.coalesce(F.col("_neg"), F.lit(0))).alias(
                "df_docs"
            ),
        )
        .filter(F.col("df_docs") > 0)
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = SEGMENT_TOKENS,
    max_docs: int = 1,
) -> DataFrame:
    """Cross-document duplicate SPANS at stride 1: every ``span_tokens``-
    token window (any alignment) hashed and counted across the corpus;
    returns (span_md5, n_docs, n_occurrences) for spans present in more
    than ``max_docs`` distinct documents.

    This is the relational core of exact-substring dedup (Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"
    find 50-token duplicate substrings with a suffix array; the
    map-reduce formulation is exactly this windowed-hash count): t41's
    fixed segments catch aligned boilerplate, stride-1 spans catch
    copied passages at ANY offset.  Fan-out is n_tokens windows per
    document (the honest cost — a suffix array trades that for global
    sorts); everything else is one shuffle on the span digest.  Short
    documents (< span_tokens) contribute their whole text as one span
    so they still participate."""
    toks = tokens(F.col(text_col))
    spans = F.when(
        F.size(toks) >= span_tokens,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - span_tokens),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, span_tokens)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(spans).alias("span")
    )
    return (
        exploded.groupBy(F.md5(F.col("span")).alias("span_md5"))
        .agg(
            F.count_distinct("id").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > max_docs)
        .withColumn("n_docs", F.col("n_docs").cast("long"))
    )


def duplicate_spans_prescreened(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = SEGMENT_TOKENS,
    max_docs: int = 1,
    fp_k: int | None = None,
    fp_window: int = 8,
) -> DataFrame:
    """Two-stage exact-substring dedup (VERDICT r4 ask #6): winnowing
    fingerprints pick the CANDIDATE documents, and the stride-1 window
    explode — the honest ~span_tokens× token fan-out of
    :func:`duplicate_spans` — runs only on them.

    LOSSLESS by the winnowing guarantee: any substring of ≥
    fp_k + fp_window - 1 normalized chars shared between two documents
    yields a shared window-minimum fingerprint in both (every window's
    min is emitted; a window inside the shared region has identical
    grams, hence an identical min).  A shared ``span_tokens``-token
    span is ≥ 2·span_tokens - 1 normalized chars (each token ≥ 1 char
    + single spaces), so fp_k defaults to the TIGHT setting
    2·span_tokens - fp_window — k + w - 1 lands exactly on the bound
    (24-char grams, 8-gram windows for 16-token spans).  Tight matters:
    short grams (say 8 chars) occur in common phrases, which on natural
    text makes nearly EVERY document a candidate and the prescreen pure
    overhead; span-sized grams are shared almost only by actual span
    co-holders.  Every such co-holder lands in the candidate set, so
    n_docs AND n_occurrences stay exact (a non-candidate cannot contain
    any qualifying span, including the short-document whole-text
    fallback, where the whole normalized text is the gram — two ≥
    span_tokens-token docs always have ≥ one full fingerprint window,
    and sub-fp_k docs gram to their whole text).

    Scale: the prescreen is one fingerprint shuffle over winnowed
    minima (a ~1/fp_window-sampled gram set, vs every stride-1 window),
    one hot-fingerprint semi join, then the exact stage on candidates
    only — on a mostly-unique corpus that turns the dominant explode
    from O(corpus tokens × span_tokens) into O(candidate tokens ×
    span_tokens).  The one-stage form stays the oracle twin (t54b pins
    the two equal cross-engine)."""
    if fp_k is None:
        fp_k = max(2 * span_tokens - fp_window, 1)
    fp = winnow_fingerprints(
        df, id_col, text_col, k=fp_k, window=fp_window, portable=False
    )
    hot = (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .filter(F.col("n_ids") > 1)
        .select("fingerprint")
    )
    cand = (
        fp.join(hot, "fingerprint", "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    return duplicate_spans(
        df.join(cand, id_col, "left_semi"),
        id_col,
        text_col,
        span_tokens,
        max_docs,
    )

def _deletion_neighborhood(key: Column) -> Column:
    """``{key} ∪ {key with one char deleted}`` — the SymSpell candidate
    set for edit distance 1.  The defining property: lev(a, b) <= 1
    implies the two sets intersect (equal -> a itself; substitution ->
    the shared both-sides deletion; insert/delete -> the shorter
    string is a deletion of the longer and a member of its own set).
    The converse does NOT hold (e.g. a transposition 'ab'/'ba' shares
    the deletion 'a' at distance 2), so candidates must verify with a
    real levenshtein — the banded-candidates-then-verify discipline of
    the MinHash/SRP operators.  Empty keys are guarded: Spark's
    sequence(1, 0) would count DOWN and fabricate variants."""
    one_del = F.when(
        F.length(key) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(key)),
            lambda i: F.concat(
                F.substring(key, F.lit(1), i - 1),
                key.substr(i + 1, F.length(key)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_union(F.array(key), one_del)


def fuzzy_join_k1(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Edit-distance-<=1 fuzzy JOIN at corpus scale: every (left,
    right) row pair whose ``key_col`` values are within one
    insertion/deletion/substitution — near-identical titles, URLs,
    product keys — WITHOUT the all-pairs levenshtein a naive fuzzy
    match needs.

    Plan shape: each side explodes into its deletion neighborhood
    (fan-out = key length + 1, the SymSpell trade: tiny bounded blow-up
    for an equi-JOINable candidate key), the sides hash-join on the
    variant string, candidate pairs dedup, and one map-side
    levenshtein(key_a, key_b) <= 1 verifies away the false positives
    (transpositions).  Shuffles are keyed (variant, then the pair
    dedup); no cartesian anywhere — at 100 TB the variant join is the
    same shape as the MinHash band join.

    Returns (left_id, right_id, key_a, key_b, dist), one row per
    verified pair."""
    va = left.select(
        F.col(left_id),
        F.col(key_col).alias("key_a"),
        F.explode(_deletion_neighborhood(F.col(key_col))).alias("_v"),
    )
    vb = right.select(
        F.col(right_id),
        F.col(key_col).alias("key_b"),
        F.explode(_deletion_neighborhood(F.col(key_col))).alias("_v"),
    )
    return (
        va.join(vb, "_v")
        .select(left_id, right_id, "key_a", "key_b")
        .distinct()
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= 1)
    )
