"""Corpus-curation operators for LLM training-data pipelines: PII
redaction, repetition-based quality filters, and train-test
decontamination.

Not in the reference (its quality surface is null/range/RI checks,
SURVEY.md §2.9); these are the north-star LLM-data extensions.  All three
follow the same scale discipline as the rest of the extension suite:

- PII detection/redaction is pure per-row regexp column expressions —
  no shuffle, whole-stage codegen, and the regex classes are shared
  Java-regex/RE2 syntax so a DuckDB oracle replays them exactly.
- Repetition stats (the Gopher/C4-style signals: top-word dominance,
  duplicate-n-gram fraction — Rae et al. 2021 §A1.1) need per-(doc, word)
  counts: one shuffle keyed on (id, token), then a per-doc rollup.
  Group cardinality is bounded by per-doc vocabulary, never corpus size.
- Decontamination joins candidate-document shingles against the
  benchmark's distinct shingle set.  Benchmarks are small by nature
  (thousands of rows), so the set broadcasts and the check is a
  map-side semi-probe per shingle — no corpus-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import regex_count, tokens

# Shared Java-regex / RE2 syntax (no lookbehind, no \p classes) so Spark
# and DuckDB match identically, character for character.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3,4}([-.]\d{4})?\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
REDACT_TOKEN = "[PII]"

# Order matters: ipv4 before phone would also work, but email must go
# first (an email's domain can contain digit runs a later pattern might
# clip mid-match); pin an explicit order so redaction is deterministic.
REDACT_ORDER = ("email", "ipv4", "phone")


def pii_count(col: Column, kind: str) -> Column:
    """Raw match count of one pattern.  NOTE: the patterns are not
    mutually exclusive on raw text (the phone shape NNN[-.]NNNN matches
    the first two octets of an IPv4) — use pii_counts for span-exclusive
    per-kind counts that mirror the redaction semantics."""
    return regex_count(col, PII_PATTERNS[kind])


def _check_token(token: str) -> str:
    """Reject replacement tokens that themselves match a PII pattern —
    a token containing e.g. a digit run would be re-matched by a LATER
    pattern in REDACT_ORDER, silently breaking pii_counts' span
    exclusivity and making counts diverge from redaction output."""
    import re

    for kind in REDACT_ORDER:
        if re.search(PII_PATTERNS[kind], token):
            raise ValueError(
                f"replacement token {token!r} matches the {kind!r} PII "
                "pattern; pick a token with no digits or @-domain shape"
            )
    return token


def _partially_redacted(col: Column, kind: str, token: str) -> Column:
    """Text with every kind EARLIER than ``kind`` in REDACT_ORDER
    already redacted — the input on which ``kind``'s matches are counted
    and replaced, so each character span is attributed to exactly one
    kind."""
    out = col
    for k in REDACT_ORDER:
        if k == kind:
            break
        out = F.regexp_replace(out, PII_PATTERNS[k], token)
    return out


def pii_counts(col: Column, token: str = REDACT_TOKEN) -> dict[str, Column]:
    """Span-exclusive per-kind PII counts: each kind is counted on the
    text with all earlier kinds redacted (exactly what redact_pii
    replaces), so one span is never double-counted — e.g. an IPv4's
    octets can no longer also count as a phone number.  Counts and
    redact_pii must share the same token; _check_token rejects tokens
    that would break the exclusivity guarantee."""
    _check_token(token)
    return {
        kind: regex_count(_partially_redacted(col, kind, token), PII_PATTERNS[kind])
        for kind in REDACT_ORDER
    }


def redact_pii(col: Column, token: str = REDACT_TOKEN) -> Column:
    """Replace every PII match with ``token``, all kinds, fixed order."""
    _check_token(token)
    out = col
    for kind in REDACT_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], token)
    return out


def word_repetition_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document repetition signals over whitespace tokens:

    (id, n_words, n_distinct_words, top_word_count, top_word_ratio,
     n_bigrams, n_distinct_bigrams, dup_bigram_ratio)

    top_word_ratio is the Gopher-style "most frequent word dominates the
    document" signal; dup_bigram_ratio (1 − distinct/total bigrams) is
    the duplicate-n-gram fraction.  Two shuffles: (id, word) counts, then
    the per-doc rollup — both keyed on bounded-cardinality groups.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    word_counts = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    word_stats = word_counts.groupBy("id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
        F.max("c").cast("long").alias("top_word_count"),
    )
    grams = df.select(
        F.col(id_col).alias("id"),
        F.when(
            F.size(tokens(F.col(text_col))) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(tokens(F.col(text_col))) - 2),
                lambda i: F.concat_ws(
                    " ", F.slice(tokens(F.col(text_col)), i + 1, 2)
                ),
            ),
        )
        .otherwise(F.array())
        .alias("g"),
    ).select(
        "id",
        F.size("g").cast("long").alias("n_bigrams"),
        F.size(F.array_distinct("g")).cast("long").alias("n_distinct_bigrams"),
    )
    return word_stats.join(grams, "id").select(
        "id",
        "n_words",
        "n_distinct_words",
        "top_word_count",
        (F.col("top_word_count").cast("double") / F.col("n_words")).alias(
            "top_word_ratio"
        ),
        "n_bigrams",
        "n_distinct_bigrams",
        F.when(F.col("n_bigrams") > 0,
               1.0 - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams"))
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_ratio"),
    )


def unigram_fluency_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_cap: int | None = None,
    min_count: int | None = None,
    floor_microp: int = 0,
) -> DataFrame:
    """Corpus-unigram fluency scoring — the integer-exact surrogate for
    LM-perplexity filtering (CCNet-style: documents whose tokens are
    improbable under a language model are dropped).  Instead of mean
    log-probability, each token scores its corpus micro-probability
    floor(count·10⁶ / total) — pure integer arithmetic, chosen because
    ln() is NOT bit-portable across engines (Spark/Java vs DuckDB ln
    differ in the last ulp for ~3% of inputs, measured), while integer
    division is exact everywhere; the token ordering induced is identical
    to the probability (hence log-probability) ordering.

    On a web-scale corpus the raw vocabulary (URLs, typos, numbers) is
    10⁸–10⁹ distinct tokens — far too large to broadcast, which is why
    the unigram table is NOT hinted: Spark's stats/AQE pick broadcast
    when it is small and shuffle-hash when it is not.  Two knobs bound
    it explicitly, exactly as production perplexity filters do (CCNet
    keeps a fixed LM vocabulary and lumps the tail):

    - ``vocab_cap``: keep only the top-K tokens by (count DESC, token
      ASC — deterministic tie-break); implemented as a TakeOrdered
      top-K, so the kept table is ≤K rows by construction.
    - ``min_count``: keep tokens seen at least this often — a pure
      filter with no global sort, the cheapest 100 TB path.

    Tokens outside the kept vocabulary score ``floor_microp`` (default
    0), the tail-lump probability.  Micro-probabilities always use the
    FULL corpus token total, so capping never inflates in-vocabulary
    scores.  Both knobs and the floor are plain relational constructs, so
    a SQL oracle replays them exactly.

    Returns (id, n_tokens, mean_microp, min_microp): low mean == rare/
    garbage vocabulary, min flags single out-of-distribution tokens.
    Distributed shape: token explode → corpus-count left join (hint-free;
    bounded by cap/min_count when set) → one per-doc aggregate; the sums
    are integer-exact, so results are partition-order-independent.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    )
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    kept = freq
    if min_count is not None:
        kept = kept.filter(F.col("c") >= F.lit(min_count))
    if vocab_cap is not None:
        kept = kept.orderBy(F.col("c").desc(), F.col("w").asc()).limit(vocab_cap)
    # integer DIV, not floor(double/) — a quotient landing within half an
    # ulp of the next integer would floor differently across engines
    microp = kept.crossJoin(F.broadcast(total)).selectExpr(
        "w", "(c * 1000000L) DIV n_total AS microp"
    )
    scored = toks.join(microp, "w", "left").withColumn(
        "microp", F.coalesce(F.col("microp"), F.lit(int(floor_microp)))
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (F.sum("microp").cast("double") / F.count(F.lit(1))).alias(
            "mean_microp"
        ),
        F.min("microp").cast("long").alias("min_microp"),
    )


def bigram_fluency_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_cap: int | None = None,
    bigram_cap: int | None = None,
    lam_num: int = 70,
    lam_den: int = 100,
) -> DataFrame:
    """Interpolated bigram-LM fluency scoring — the n-gram upgrade of
    :func:`unigram_fluency_stats` (VERDICT r8 ask #6; CCNet's quality
    signal is a 5-gram KenLM — the bigram is the smallest model with
    CONTEXT, and the interpolation/backoff structure is the same).
    Every arithmetic step before the final mean is integer-exact, for
    the same reason as the unigram filter: ln()/double-pow are not
    bit-portable across engines, integer division is.

    Per token position i (corpus-level counts):

    - unigram score   u_i = floor(c(w_i) · 10⁶ / total)   (0 if OOV)
    - bigram score    b_i = floor(c(w_{i-1}, w_i) · 10⁶ / c(w_{i-1}))
    - position score  s_i = (lam_num·b_i + (lam_den−lam_num)·u_i)
                            DIV lam_den      when the bigram is in the
                            kept table and i ≥ 2 (Jelinek-Mercer
                            interpolation with integer weights),
                      s_1 and bigram-OOV positions BACK OFF to u_i
                      (Katz-style: no context evidence → unigram).

    The conditional's denominator is the FULL corpus count of the
    context token, never the capped table's, so capping cannot inflate
    probabilities.  ``vocab_cap`` / ``bigram_cap`` bound both model
    tables (top-K by count DESC, token(s) ASC — deterministic
    tie-breaks) exactly as the unigram filter does: at web scale the
    raw bigram vocabulary is quadratic in the unigram's, so a bounded
    table is the only shippable model; OOV lumps to the backoff path.

    Distributed shape: one pass builds (prev, cur) pairs by zipping
    the token array with its shifted self (column exprs only — no
    per-doc window, no O(len²) blowup), two bounded count tables, two
    hint-free joins (Spark broadcasts them when small), one per-doc
    integer aggregate.  Returns (id, n_tokens, mean_fluency double,
    min_fluency long)."""
    if not 0 <= lam_num <= lam_den or lam_den <= 0:
        raise ValueError(
            f"bigram_fluency_stats: need 0 <= lam_num ({lam_num}) <= "
            f"lam_den ({lam_den}), lam_den > 0"
        )
    ws = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("ws")
    )
    prevs = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(
            F.col("ws"), 1, F.greatest(F.size("ws") - 1, F.lit(0))
        ),
    )
    tok = ws.select(
        "id",
        F.posexplode(
            F.zip_with(
                F.col("ws"),
                prevs,
                lambda c, p: F.struct(c.alias("w"), p.alias("prev")),
            )
        ).alias("pos", "s"),
    ).select("id", F.col("s.w").alias("w"), F.col("s.prev").alias("prev"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = uni.agg(F.sum("c").alias("n_total"))
    kept_u = uni
    if vocab_cap is not None:
        kept_u = kept_u.orderBy(
            F.col("c").desc(), F.col("w").asc()
        ).limit(vocab_cap)
    microp_u = kept_u.crossJoin(F.broadcast(total)).selectExpr(
        "w", "(c * 1000000L) DIV n_total AS up"
    )
    big = (
        tok.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("w1"), F.col("w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    kept_b = big
    if bigram_cap is not None:
        kept_b = kept_b.orderBy(
            F.col("c2").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(bigram_cap)
    microp_b = kept_b.join(
        uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1"
    ).selectExpr("w1", "w2", "(c2 * 1000000L) DIV c1 AS bp")
    scored = (
        tok.join(microp_u, "w", "left")
        .join(
            microp_b,
            (F.col("prev") == F.col("w1")) & (F.col("w") == F.col("w2")),
            "left",
        )
        .withColumn("up", F.coalesce(F.col("up"), F.lit(0)))
        .withColumn(
            "score",
            F.when(
                F.col("bp").isNotNull(),
                F.expr(
                    f"({lam_num}L * bp + {lam_den - lam_num}L * up) "
                    f"DIV {lam_den}L"
                ),
            ).otherwise(F.col("up")),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (F.sum("score").cast("double") / F.count(F.lit(1))).alias(
            "mean_fluency"
        ),
        F.min("score").cast("long").alias("min_fluency"),
    )


def contamination_stats(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Train-test decontamination: for each candidate document, the
    fraction of its word n-gram shingles that appear ANYWHERE in the
    benchmark corpus (the standard n-gram-overlap contamination test,
    e.g. GPT-3 appendix C / PaLM appendix).

    Returns (id, n_shingles, n_overlap, contamination_ratio).  The
    benchmark's distinct shingle set is deduplicated across its documents
    and broadcast (benchmarks are small by construction); candidates keep
    their shingles distinct per doc, so the probe is one broadcast
    left-semi-shaped join plus a per-doc rollup.
    """
    from .dedup import shingle_table

    cand = shingle_table(candidates, id_col, text_col, n=n)
    bench = F.broadcast(
        shingle_table(benchmark, id_col, text_col, n=n)
        .select("shingle")
        .distinct()
    )
    hits = (
        cand.join(bench, "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    sizes = cand.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    return sizes.join(hits, "id", "left").select(
        "id",
        "n_shingles",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        (
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
            / F.col("n_shingles")
        ).alias("contamination_ratio"),
    )


# ------------------------------------- hashed-feature quality classifier

CLS_BUCKETS = 1024       # feature-hashing dimensionality
CLS_WEIGHT_SPAN = 1000   # integer weights in [-span, +span]


def hashed_bucket(token: Column) -> Column:
    """Feature-hashing trick: token -> bucket id via the engine-portable
    md5-prefix hash (operators/dedup.md5_hash32) mod CLS_BUCKETS."""
    from .dedup import md5_hash32

    return md5_hash32(token) % F.lit(CLS_BUCKETS)


def bucket_weight(bucket: Column) -> Column:
    """Deterministic integer weight for one feature bucket, derived by
    hashing the bucket id — a STAND-IN weight table with the exact
    runtime shape of a trained linear model (fastText-style quality
    classifiers as used in public CCNet/GPT-3 data recipes): real
    deployments swap this expression for a broadcast (bucket, weight)
    table learned offline; every plan property measured here (pure
    column arithmetic, no shuffle, no Python) is unchanged by that swap.
    Integer weights keep the score exact cross-engine."""
    from .dedup import md5_hash32

    return (
        md5_hash32(F.concat(F.lit("w:"), bucket.cast("string")))
        % F.lit(2 * CLS_WEIGHT_SPAN + 1)
    ) - F.lit(CLS_WEIGHT_SPAN)


def classifier_score(col: Column) -> Column:
    """The document score as ONE reusable column expression (a single
    higher-order fold) — shared by classifier_scores and the streaming
    s5 gate so batch and in-flight scoring cannot drift."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: acc + bucket_weight(hashed_bucket(t)),
    )


def classifier_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Linear text classifier over hashed unigram features:
    (id, n_tokens, score, keep) with score = sum of bucket weights and
    keep = score > 0 (the sign of the margin — thresholding mirrors the
    perplexity/quality cutoffs of production filters).

    The whole scorer is ONE higher-order fold over the token array —
    per-row compute inside whole-stage codegen, zero shuffles, zero
    Python; at 100 TB this runs at scan speed, which is exactly why the
    hashing trick (not a vocabulary join) is the right scorer shape."""
    toks = tokens(F.col(text_col))
    score = classifier_score(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score"),
        (score > 0).alias("keep"),
    )


# ------------------------------------------------- URL / domain filtering

# Shared Java-regex / RE2 syntax (same discipline as PII_PATTERNS)
URL_HOST_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_domain(col: Column) -> Column:
    """Host of the first URL in the text ('' when none) — the C4/
    RefinedWeb provenance signal every web-corpus filter keys on.  Pure
    regexp column expression; DuckDB replays it character-for-character."""
    return F.regexp_extract(col, URL_HOST_PATTERN, 1)


def weight_table(spark) -> DataFrame:
    """The stand-in weight table MATERIALIZED as (bucket, weight) rows —
    what a trained classifier actually ships.  Enumerates every bucket
    with the same hash-derived weights bucket_weight computes inline, so
    the two scorer variants are provably interchangeable (tested)."""
    return spark.range(CLS_BUCKETS).select(
        F.col("id").cast("long").alias("bucket"),
        bucket_weight(F.col("id")).alias("weight"),
    )


def classifier_scores_with_table(
    df: DataFrame, id_col: str, text_col: str, weights: DataFrame
) -> DataFrame:
    """The scorer's production form: per-token bucket ids joined against
    a broadcast LEARNED weight table (any (bucket, weight) rows), summed
    per document.  Costs one (id, bucket) shuffle that the inline-fold
    variant avoids — use classifier_scores when weights are expressible,
    this when they come from offline training.  Missing buckets weigh 0.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    ).withColumn("bucket", hashed_bucket(F.col("w")))
    scored = (
        toks.join(F.broadcast(weights), "bucket", "left")
        .groupBy("id")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0)))
            .cast("long")
            .alias("score"),
        )
    )
    return scored.select(
        "id", "n_tokens", "score", (F.col("score") > 0).alias("keep")
    )


# ------------------------------------- checksum-validated card-number PII

# 16-digit payment-card shape with optional -/space group separators.
# Regex DETECTS candidates; the Luhn checksum VALIDATES them — the
# standard two-stage rule public PII scanners use, because a bare
# 16-digit regex fires on order numbers and phone-number runs (the t59
# gate plants a checksum-failing lookalike to pin the distinction).
CARD_PATTERN = r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b"
CARD_TOKEN = "[CARD]"


def luhn_sql(d: str) -> str:
    """Luhn checksum validity as one Spark SQL boolean expression over a
    separator-free digit-string expression ``d``: from the RIGHT, every
    second digit doubles (minus 9 when > 9), and the sum must divide by
    10.  Pure integer list arithmetic — the DuckDB oracle twin runs the
    same formula with list_transform/list_sum."""
    digit = f"CAST(substring({d}, i, 1) AS INT)"
    return (
        f"aggregate(transform(sequence(1, length({d})), i -> "
        f"IF((length({d}) - i) % 2 = 1, "
        f"IF({digit} * 2 > 9, {digit} * 2 - 9, {digit} * 2), "
        f"{digit})), 0, (acc, x) -> acc + x) % 10 = 0"
    )


def _card_sql_parts(text_sql: str, token: str) -> tuple[str, str, str]:
    """(n_candidates, n_valid, redacted) Spark SQL fragments.  The
    redaction folds the candidate list over the text, replacing only the
    Luhn-VALID matches — a regex alone cannot compute the checksum, so
    the per-match fold is the redaction mechanism (left-to-right in
    match order; replace() hits every occurrence of that exact match,
    deterministic in both engines)."""
    sql_pat = CARD_PATTERN.replace("\\", "\\\\")
    cands = f"regexp_extract_all({text_sql}, '{sql_pat}', 0)"
    clean = "replace(replace(m, '-', ''), ' ', '')"
    valid = luhn_sql(clean)
    n_cands = f"size({cands})"
    n_valid = f"size(filter({cands}, m -> {valid}))"
    redacted = (
        f"aggregate({cands}, {text_sql}, (acc, m) -> "
        f"IF({valid}, replace(acc, m, '{token}'), acc))"
    )
    return n_cands, n_valid, redacted


def card_scan(
    df: DataFrame, id_col: str, text_col: str, token: str = CARD_TOKEN
) -> DataFrame:
    """(id, n_candidates, n_valid, redacted): card-shaped candidate
    count, Luhn-validated count, and the text with only the VALID
    matches redacted.  Zero shuffles, zero Python — candidate
    extraction, checksum, and redaction are one higher-order expression
    chain running map-side at scan speed."""
    n_cands, n_valid, redacted = _card_sql_parts("__t__", token)
    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t__")
    ).select(
        "id",
        F.expr(n_cands).cast("long").alias("n_candidates"),
        F.expr(n_valid).cast("long").alias("n_valid"),
        F.expr(redacted).alias("redacted"),
    )


# --------------------------- in-engine classifier training (linear GD)

def hashed_count_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bucket, x): per-document TERM-FREQUENCY features over the
    same CLS_BUCKETS space the scorer uses — bucket count divided by
    the document's token count, so each feature row sums to 1 per doc.
    TF normalization is what makes plain gradient descent stable here:
    with row sums of 1 the Gram matrix's eigenvalues are <= 1, so any
    lr < 2 converges (raw counts blow up at the same lr — observed).
    One shuffle on (id, bucket); the count/divide arithmetic is exact
    integer -> one IEEE division, oracle-replayable."""
    t = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("w"),
        F.size(tokens(F.col(text_col))).alias("n_toks"),
    )
    return t.groupBy(
        "id", hashed_bucket(F.col("w")).alias("bucket"), F.col("n_toks")
    ).agg(
        (F.count(F.lit(1)).cast("double") / F.col("n_toks")).alias("x")
    ).select("id", "bucket", "x")


def _doc_dot(joined: DataFrame) -> DataFrame:
    """Per-doc Σ x·w as a DETERMINISTIC bucket-ordered fold: collect the
    (bucket, xw) pairs, sort, fold left — bit-identical under any
    partitioning, and exactly replayable as DuckDB's
    list_reduce(list(xw ORDER BY bucket)).  (A plain SUM of doubles
    would be partition-order-dependent.)"""
    return joined.groupBy("id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "xw"))),
                lambda s: s["xw"],
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("yhat")
    )


def train_linear_classifier(
    features: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    lr: float = 1.9,
    checkpoint: bool = True,
) -> dict[int, float]:
    """Least-squares linear classifier trained by full-batch gradient
    descent IN the engine — the training half of the t42/t42b scoring
    story (whose stand-in weights 'production swaps for offline-trained
    ones'; now the offline trainer exists and is itself distributed).

    Per iteration: residuals r_d = Σ_b x_db·w_b − y_d (bucket-ordered
    double fold, see _doc_dot), then per-bucket gradients
    g_b = Σ_d x_db·r_d accumulated in DECIMAL — exact and
    order-independent, so the whole training loop is deterministic on
    any cluster AND replayable by an unrolled SQL oracle (the ivf_train
    discipline applied to model fitting).  Driver state per iteration is
    one weight table bounded by CLS_BUCKETS (k·1 doubles — broadcast
    back, never corpus-sized); every corpus-sized pass is distributed.
    w update: w_b ← w_b − lr·g_b/n with IEEE double arithmetic.

    ``features`` is hashed_count_features output; ``labels`` is
    (id, y double).  Returns {bucket: weight} for observed buckets.

    ``checkpoint=True`` materializes both inputs once up front — the
    same lineage-truncation discipline the BPE and connected-components
    loops use: every round re-reads the feature relation, and without
    the checkpoint each round re-runs the tokenize/explode/groupBy
    lineage from raw text (measured 3-4× the training wall time)."""
    spark = features.sparkSession
    if checkpoint:
        features = features.localCheckpoint(eager=True)
        labels = labels.localCheckpoint(eager=True)
    n = labels.count()
    w: dict[int, float] = {}
    for _ in range(iters):
        if w:
            wdf = spark.createDataFrame(
                list(w.items()), "bucket long, wgt double"
            )
            joined = features.join(F.broadcast(wdf), "bucket", "left").select(
                "id",
                "bucket",
                (F.col("x") * F.coalesce(F.col("wgt"), F.lit(0.0))).alias("xw"),
            )
            yhat = _doc_dot(joined)
        else:  # all-zero weights: yhat is exactly 0.0 for every doc
            yhat = labels.select("id", F.lit(0.0).alias("yhat"))
        resid = labels.join(yhat, "id", "left").select(
            "id",
            (F.coalesce(F.col("yhat"), F.lit(0.0)) - F.col("y")).alias("r"),
        )
        grads = (
            features.join(resid, "id")
            .groupBy("bucket")
            .agg(
                F.sum((F.col("x") * F.col("r")).cast("decimal(28,12)"))
                .cast("double")
                .alias("g")
            )
            .collect()
        )
        for row in grads:
            w[row.bucket] = w.get(row.bucket, 0.0) - lr * row.g / n
    return w


def classifier_predictions(
    features: DataFrame,
    labels: DataFrame,
    weights: dict[int, float],
    threshold: float | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """(id, y, yhat, predicted): scores under trained weights (same
    bucket-ordered fold as training).  ``threshold=None`` self-
    calibrates at the corpus mean score (decimal-exact average of the
    quantized scores — order-independent, oracle-replayable): a
    least-squares score regresses toward the class rates, so the mean
    sits between the class clusters without hand-tuning."""
    from ..functions.exprs import quant

    spark = features.sparkSession
    wdf = spark.createDataFrame(list(weights.items()), "bucket long, wgt double")
    joined = features.join(F.broadcast(wdf), "bucket", "left").select(
        "id",
        "bucket",
        (F.col("x") * F.coalesce(F.col("wgt"), F.lit(0.0))).alias("xw"),
    )
    scored = labels.join(_doc_dot(joined), "id", "left").select(
        "id",
        F.col("y").cast("long").alias("y"),
        quant(F.coalesce(F.col("yhat"), F.lit(0.0)), ndigits).alias("yhat"),
    )
    if threshold is None:
        thr = scored.agg(
            (
                F.sum(F.col("yhat").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__thr__")
        )
        return scored.crossJoin(F.broadcast(thr)).select(
            "id",
            "y",
            "yhat",
            (F.col("yhat") >= F.col("__thr__")).alias("predicted"),
        )
    return scored.select(
        "id", "y", "yhat", (F.col("yhat") >= F.lit(threshold)).alias("predicted")
    )
