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
