"""BPE merge induction — distributed tokenizer training (the
Sennrich et al. 2016 byte-pair-encoding loop) as an iterative Spark job.

Each round: count adjacent token pairs across the corpus (one shuffle),
take the single most frequent pair (a TakeOrdered of ONE row to the
driver — bounded state per round), and apply the merge everywhere with a
literal string replace.  No Python in the distributed path; the loop is
driver-side control flow exactly like connected components
(operators/graph.py), with localCheckpoint truncating lineage per round.

Cross-engine exactness engineering (the t48 oracle unrolls the same
rounds in DuckDB):

- The working form is a delimited string, not a token array: tokens are
  wrapped in \\x1f markers (``\\x1f tok \\x1f``) and concatenated, so a
  merge is a LITERAL replace of ``\\x1fa\\x1f\\x1fb\\x1f`` with
  ``\\x1fa\\x1eb\\x1f`` — no regex anywhere (RE2/DuckDB has no lookbehind,
  and delimiter consumption makes matches structurally non-overlapping,
  so both engines' scan-forward replace-all agree, including on runs
  like ``a a a`` where BPE merges leftmost-first).
- Pair counting is OVERLAPPING adjacent positions (true BPE counts:
  ``a a a`` counts (a,a) twice), done with list arithmetic both engines
  share.
- Ties break on (count DESC, a ASC, b ASC); tokens are ASCII and the
  markers are single low bytes, where Java UTF-16 and DuckDB memcmp
  string orders coincide.

Scale: per round, the pair count is the only corpus-sized operation; the
merge apply is map-side.  Production BPE trains on a corpus SAMPLE
(hundreds of MB suffice) with thousands of merges — this operator's
per-round cost is what matters, not the round count, and each round's
driver state is one (pair, count) row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

SEP = "\x1f"   # token boundary marker (never appears in normalized text)
JOIN = "\x1e"  # intra-merged-token joiner


def _working_corpus(df: DataFrame, text_col: str) -> DataFrame:
    w = F.concat(
        F.lit(SEP), F.array_join(tokens(F.col(text_col)), SEP + SEP), F.lit(SEP)
    )
    return df.select(w.alias("w"))


def _adjacent_pairs(cur: DataFrame) -> DataFrame:
    toks = F.split(F.expr("substring(w, 2, length(w) - 2)"), SEP + SEP)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("a"),
                F.element_at(toks, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array())
    return cur.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


def learn_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int = 4
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns
    [(merge_rank, token_a, token_b, n_occurrences), ...] where later
    rounds' tokens may be earlier merges (containing the \\x1e joiner).
    Stops early if the corpus runs out of repeated pairs."""
    cur = _working_corpus(df, text_col)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        cur = cur.localCheckpoint(eager=True)
        top = (
            _adjacent_pairs(cur)
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0].a, top[0].b, top[0].c
        merges.append((r + 1, a, b, c))
        cur = cur.select(
            F.replace(
                F.col("w"),
                F.lit(SEP + a + SEP + SEP + b + SEP),
                F.lit(SEP + a + JOIN + b + SEP),
            ).alias("w")
        )
    return merges


def _md5_bucket32(col) -> "F.Column":
    """Deterministic 32-bit content bucket — the md5-portable discipline
    (operators/dedup._md5_long's 8-hex-char form): identical in Spark
    (conv) and DuckDB (('0x' || substr(md5(x),1,8))::BIGINT), stable
    under any partitioning or cluster size."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def learn_bpe_merges_batched(
    df: DataFrame,
    text_col: str,
    n_merges: int = 4,
    sample_docs: int | None = None,
) -> tuple[list[tuple[int, str, str, int]], int]:
    """BPE training with MERGE BATCHING (VERDICT r4 ask #4): per corpus
    pass, take the maximal PREFIX of the ranked pair list whose pairs
    are pairwise token-disjoint and apply them all — one shuffle + one
    ≤ remaining-merges collect per PASS instead of per MERGE, so a 32k
    vocabulary needs ~thousands of passes instead of exactly 32k (the
    round count collapses by the mean batch width; English text batches
    several merges per pass because top pairs usually involve different
    letters).

    Equivalence to the sequential loop: an accepted pair's count cannot
    be changed by earlier merges in its batch (their tokens are
    disjoint), and stopping at the FIRST conflict means every skipped
    pair ranks below every accepted one — so the batch replays the
    sequential selection exactly UNLESS a pair newly created mid-batch
    (count ≤ the creating merge's count) would have outranked a later
    accepted pair.  That is the standard parallel-BPE approximation;
    the t57 gate pins batched == sequential on the gate corpus against
    the unrolled sequential oracle, and the property test cross-checks
    both paths on the fixture.

    ``sample_docs`` (VERDICT r5 ask #4) bounds TRAINING cost in corpus
    size — the public practice (a few GB of sample train a production
    tokenizer; encoding the full corpus stays map-side): training runs
    on the ~sample_docs documents whose 32-bit md5 content bucket
    satisfies bucket % max(1, N // sample_docs) == 0 — a deterministic,
    partition-independent, cross-engine-replayable selection (the t16
    modulo discipline keyed on content, since the trainer sees no id
    column).  With it, every pass scans a BOUNDED corpus whatever N is:
    merges/sec stays flat as the corpus grows (the bench's bpe probe
    measures exactly this).  Costs one COUNT pass to size the modulus.

    Returns (merges, n_passes) with merges in sequential-rank form
    [(merge_rank, token_a, token_b, n_occurrences), ...] — counts are
    SAMPLE counts when sampling."""
    if sample_docs is not None:
        n = df.count()
        mod = max(1, n // sample_docs)
        df = df.filter(_md5_bucket32(F.col(text_col)) % mod == 0)
    cur = _working_corpus(df, text_col)
    merges: list[tuple[int, str, str, int]] = []
    passes = 0
    while len(merges) < n_merges:
        cur = cur.localCheckpoint(eager=True)
        remaining = n_merges - len(merges)
        top = (
            _adjacent_pairs(cur)
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(remaining)  # driver state bounded by the vocab target
            .collect()
        )
        if not top:
            break
        passes += 1
        used: set[str] = set()
        accepted: list[tuple[str, str, int]] = []
        for r in top:
            if r.a in used or r.b in used:
                break  # first conflict ends the maximal disjoint prefix
            accepted.append((r.a, r.b, r.c))
            used.update((r.a, r.b))
        for a, b, c in accepted:
            merges.append((len(merges) + 1, a, b, c))
        w = F.col("w")
        # disjoint tokens -> the literal replaces can never overlap, so
        # applying them in one map-side select equals applying in rank
        # order one at a time
        for a, b, _ in accepted:
            w = F.replace(
                w,
                F.lit(SEP + a + SEP + SEP + b + SEP),
                F.lit(SEP + a + JOIN + b + SEP),
            )
        cur = cur.select(w.alias("w"))
    return merges, passes


def apply_bpe_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
) -> DataFrame:
    """Encode the corpus with a learned merge list: apply every merge in
    rank order (the BPE encode rule) and return
    (id, n_tokens_ws, n_tokens_bpe) — whitespace tokens before, merged
    tokens after.  Pure map-side literal replaces, zero shuffles: at
    100 TB encoding runs at scan speed, which is why BPE ENCODING is a
    cheap per-row operator even though training (learn_bpe_merges) needs
    a per-round corpus aggregate."""
    toks = tokens(F.col(text_col))
    w = F.concat(F.lit(SEP), F.array_join(toks, SEP + SEP), F.lit(SEP))
    for _, a, b, _ in merges:
        w = F.replace(
            w,
            F.lit(SEP + a + SEP + SEP + b + SEP),
            F.lit(SEP + a + JOIN + b + SEP),
        )
    inner = w.substr(F.lit(2), F.length(w) - 2)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens_ws"),
        F.size(F.split(inner, SEP + SEP)).cast("long").alias("n_tokens_bpe"),
    )
