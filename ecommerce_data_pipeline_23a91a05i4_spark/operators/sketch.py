"""Portable HyperLogLog distinct-count sketch — COUNT(DISTINCT) for
the 100 TB tier.

Exact COUNT(DISTINCT) is the worst shuffle in an analytics engine: every
distinct value crosses the wire and the reduce side must hold the whole
distinct set.  The published HyperLogLog estimator (Flajolet, Fusy,
Gandouet, Meunier 2007 — the algorithm behind Spark's own
``approx_count_distinct`` HLL++ and Postgres/BigQuery sketches) replaces
it with ``m = 2^p`` one-byte registers per group: the shuffle carries at
most ``m`` (register, max-rank) rows per group whatever the cardinality,
map-side partial ``MAX`` combine does almost all the work, and sketches
are MERGEABLE (register-wise max) — the property that makes distinct
counts composable across shards, days, and streams without ever
re-reading raw data.  A register relation is an ordinary DataFrame, so a
persisted sketch (e.g. in a TxTable) is incrementally maintainable: union
the new shard's registers and re-max.

Everything is engine-portable on purpose (the repo's cross-engine
discipline, so the t67 oracle replays the WHOLE estimator in DuckDB):

- two hash paths, the repo's dual-hash discipline: xxhash64 (default —
  JVM integer hash + bit ops, the fast production path) and md5
  (lower-hex in both engines, split positionally: ``p/4`` hex chars of
  register index + 15 hex chars of rank material — the path the oracle
  replays); ``p`` must be a multiple of 4 for the clean nibble split;
- the rank (leading-zero count + 1) is PURE string/CASE arithmetic on
  hex digits — no log2, no engine bit intrinsics;
- the harmonic sum ``sum(2^-rank)`` is scaled by 2^61 into exact
  integers and summed as decimal (order-independent), with ONE final
  cast-to-double and ONE IEEE division — bit-identical across engines;
- the bias constant ``alpha_m * m^2 * 2^61`` is folded to a single
  Python double so both engines consume one identical literal.

Zero UDFs, zero driver state; unlike Spark's built-in
``approx_count_distinct`` the sketch here is a first-class relation the
caller can store, merge, and audit.
"""

from __future__ import annotations

import functools
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import dsum, quant

#: rank material: 15 hex chars = 60 bits after the index prefix; an
#: all-zero suffix gets rank 61.  Scaling by 2^61 keeps every term
#: 2^(61-rank) an exact bigint.
RANK_HEX_CHARS = 15
RANK_SCALE_BITS = 61
TWO_61 = 1 << RANK_SCALE_BITS


def hll_alpha(m: int) -> float:
    """The published HLL bias correction alpha_m: the Flajolet et al.
    2007 paper tabulates alpha_16 = 0.673, alpha_32 = 0.697,
    alpha_64 = 0.709 and reserves the asymptotic 0.7213/(1 + 1.079/m)
    form for m >= 128 (ADVICE r6: the asymptotic form at m = 16 added
    ~0.4% systematic bias and the docstring misstated the paper)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _check_p(p: int) -> int:
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(
            f"hll: p must be a multiple of 4 in [4, 16] (got {p}) — the "
            "register index is split from the md5 hex string a nibble "
            "at a time"
        )
    return 1 << p


def hll_rank(w_hex: Column, hex_chars: int = RANK_HEX_CHARS) -> Column:
    """Leading-zero-bits(w)+1 over a ``hex_chars``-long hex string, as
    portable string/CASE arithmetic: 4 bits per leading '0' char
    (counted by TRIM LEADING — no per-row regex in the hot path), plus
    the leading zeros WITHIN the first nonzero hex digit."""
    stripped = F.ltrim(w_hex, F.lit("0"))
    z = F.lit(hex_chars) - F.length(stripped)
    first_nz = F.substring(stripped, 1, 1)
    in_char = (
        F.when(first_nz == "1", 3)
        .when(first_nz.isin("2", "3"), 2)
        .when(first_nz.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (
        F.when(z == hex_chars, F.lit(4 * hex_chars + 1))
        .otherwise(z * 4 + in_char + 1)
        .cast("int")
    )


def hll_registers(
    df: DataFrame,
    cols: list[str],
    group_by: list[str] | None = None,
    p: int = 12,
    hash: str = "xx",
) -> DataFrame:
    """Build the sketch: (group_by..., ridx int, rmax int) with at most
    ``2^p`` register rows per group.  ONE shuffle on (group, ridx) with
    map-side partial MAX — the full distinct set never moves.  Rows
    with a NULL in any counted column are ignored (multi-column
    COUNT(DISTINCT) semantics).

    ``hash`` follows the repo's dual-hash discipline (dedup.py's
    xxhash64/md5 split): ``"xx"`` (default) keys registers off
    xxhash64 — a JVM integer hash plus bit ops, the fast production
    path; ``"md5"`` derives everything from the md5 hex string — the
    engine-portable path the t67 oracle replays verbatim in DuckDB.
    Sketches built with different hashes have different register
    contents and must not be merged with each other."""
    _check_p(p)
    group_by = list(group_by or [])
    not_null = functools.reduce(
        Column.__and__, (F.col(c).isNotNull() for c in cols)
    )
    if hash == "md5":
        # unit-separator join: ("ab","c") and ("a","bc") must hash as
        # DIFFERENT keys (a separator-less concat collides them); one
        # column passes through unchanged (t67/s8 oracles unaffected)
        val = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
        hexd = F.md5(val)
        idx = F.conv(F.substring(hexd, 1, p // 4), 16, 10).cast("int")
        w = F.substring(hexd, p // 4 + 1, RANK_HEX_CHARS)
        rank = hll_rank(w, RANK_HEX_CHARS)
    elif hash == "xx":
        h = F.xxhash64(*[F.col(c) for c in cols])
        # top p bits -> register index; low 64-p bits -> rank window
        # (p % 4 == 0 keeps the window a whole number of hex chars, so
        # the same trim-based leading-zero count serves both paths)
        idx = F.shiftrightunsigned(h, 64 - p).cast("int")
        mask = (1 << (64 - p)) - 1
        w_chars = (64 - p) // 4
        w = F.lpad(F.lower(F.hex(h.bitwiseAND(F.lit(mask)))), w_chars, "0")
        rank = hll_rank(w, w_chars)
    else:
        raise ValueError(f"hll: unknown hash {hash!r} (use 'xx' or 'md5')")
    return (
        df.filter(not_null)
        .select(*group_by, idx.alias("ridx"), rank.alias("rmax"))
        .groupBy(*group_by, "ridx")
        .agg(F.max("rmax").alias("rmax"))
    )


def hll_merge(*sketches: DataFrame, group_by: list[str] | None = None) -> DataFrame:
    """Union register relations and re-max: the lossless sketch union
    (estimate(merge(A, B)) == estimate(sketch of A ∪ B), exactly —
    pinned by test).  This is how shard/day/stream sketches compose
    without touching raw data."""
    group_by = list(group_by or [])
    u = functools.reduce(DataFrame.unionByName, sketches)
    return u.groupBy(*group_by, "ridx").agg(F.max("rmax").alias("rmax"))


def hll_estimate(
    regs: DataFrame,
    group_by: list[str] | None = None,
    p: int = 12,
    correction: bool = True,
    ndigits: int = 4,
) -> DataFrame:
    """Per-group cardinality estimate from a register relation:
    (group_by..., approx_distinct double).  The harmonic-mean path is
    exact-integer up to one final division, so it replays bit-identical
    in any SQL engine; ``correction=True`` additionally applies the
    published small-range linear counting branch (E <= 2.5m with empty
    registers -> m*ln(m/V)) whose ``ln`` is the one operation engines
    MAY round differently — leave it on for accuracy, and pick gate
    data that exercises the harmonic branch when cross-engine
    bit-equality is the requirement."""
    m = _check_p(p)
    group_by = list(group_by or [])
    term = F.expr(
        f"shiftleft(cast(1 as bigint), {RANK_SCALE_BITS} - rmax)"
    )
    # geometry guard piggybacked on the estimate aggregation itself
    # (ADVICE r6: a separate blocking agg(max) action here re-ran the
    # whole register build when the sketch was an uncached lineage —
    # doubling the cost of the operation the sketch exists to cut)
    agg = regs.groupBy(*group_by).agg(
        dsum(term, "decimal(38,0)").alias("_z_present"),
        F.count(F.lit(1)).alias("_n_present"),
        F.max("ridx").alias("_max_ridx"),
    )
    v = (F.lit(m) - F.col("_n_present")).cast("long")
    z = (
        F.col("_z_present")
        + v.cast("decimal(38,0)") * F.lit(TWO_61).cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    # one double literal both engines share verbatim (repr round-trips)
    const = hll_alpha(m) * (m * m) * float(TWO_61)
    e_harm = F.lit(const) / z.cast("double")
    if correction:
        est = F.when(
            (e_harm <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
        ).otherwise(e_harm)
    else:
        est = e_harm
    guarded = F.coalesce(
        _geometry_guard(F.col("_max_ridx"), m, "hll_estimate").cast(
            "double"
        ),
        quant(est, ndigits),
    )
    return agg.select(*group_by, guarded.alias("approx_distinct"))


def approx_count_distinct_portable(
    df: DataFrame,
    cols: list[str],
    group_by: list[str] | None = None,
    p: int = 12,
    correction: bool = True,
    ndigits: int = 4,
    hash: str = "xx",
) -> DataFrame:
    """One-call sketch-then-estimate (the COUNT(DISTINCT) drop-in).
    Relative error ~ 1.04/sqrt(2^p): p=12 -> ~1.6% with 4096 register
    rows per group in flight — vs every distinct value for the exact
    form."""
    return hll_estimate(
        hll_registers(df, cols, group_by, p, hash=hash),
        group_by,
        p,
        correction=correction,
        ndigits=ndigits,
    )


# ------------------------------------------------------ count-min sketch

def _cms_addresses(cols: list[str], depth: int, width: int) -> Column:
    """The depth-salted md5 counter addresses for one key, as an array
    column — ONE definition shared by build and estimate, because any
    drift between the two silently addresses the wrong cells (estimates
    collapse toward 0 with no error)."""
    # unit-separator join: ("ab","c") and ("a","bc") must hash as
    # DIFFERENT keys (a separator-less concat collides them).  For
    # one column the value passes through unchanged, which is what
    # keeps the single-column oracles (t67/s8) byte-identical.
    val = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{d}:"), val)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).cast("int")
            for d in range(depth)
        ]
    )


def _geometry_guard(value: Column, bound: int, what: str) -> Column:
    """In-plan geometry guard: NULL when ``value`` respects its bound,
    raise_error otherwise — the detectable half of a build/estimate
    parameter mismatch (a sketch built WIDER than the reader assumes
    addresses cells past the reader's modulus; the opposite direction
    is mathematically indistinguishable from an unlucky sketch and
    stays the caller's contract).  Folded into the estimate's own plan
    so validation costs ZERO extra jobs (ADVICE r6: the former eager
    agg(max) action recomputed uncached sketch lineages a second time,
    roughly doubling the operation the sketch exists to make cheap);
    the mismatch surfaces when the estimate is executed.  The flip side
    of living in the plan: the guard is evaluated WITH the estimate
    expression — a consumer that projects the estimate column away
    reads no estimated values and skips validation with them (Catalyst
    column pruning); the contract is that mismatches fail before any
    estimated VALUE can be consumed, not that every degenerate
    projection of the relation revalidates geometry.  Thin wrapper
    over the shared exprs.plan_guard idiom (quantize._subvectors is
    the other user)."""
    from ..functions.exprs import plan_guard

    return plan_guard(
        value >= F.lit(bound),
        F.lit(f"{what}: sketch addresses cell "),
        value.cast("string"),
        F.lit(
            f" but the estimate was called with a bound of "
            f"{bound} — build and estimate must share the same "
            "geometry parameters"
        ),
    ).cast("long")


def cms_build(
    df: DataFrame,
    cols: list[str],
    depth: int = 4,
    width: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a counters
    relation (d int, w int, cnt long): ``depth`` independent hash rows
    of ``width`` counters each; every input row increments one counter
    per hash row.  The frequency workhorse at 100 TB: exact per-key
    counts shuffle every distinct key, the sketch shuffles at most
    ``depth × width`` counter rows whatever the key cardinality, and
    sketches MERGE by counter-wise sum (cms_merge) — composable across
    shards/days like the HLL registers.  Hashing is md5 salted with
    the row index (engine-portable, the repo's oracle discipline);
    rows with a NULL in any counted column are ignored.

    ``group_cols``: per-group sketches in the SAME scan — output
    (group…, d, w, cnt), state ≤ groups × depth × width rows.
    Addresses hash the KEY columns only (the t74 grouped-histogram
    discipline: one shared geometry across groups), so per-group
    sketches sum into the global one losslessly.  Rows with a NULL in
    a group column are ignored like NULL keys — a NULL group has no
    per-group frequency question to answer."""
    g = list(group_cols or [])
    not_null = functools.reduce(
        Column.__and__, (F.col(c).isNotNull() for c in g + cols)
    )
    return (
        df.filter(not_null)
        .select(
            *g, F.posexplode(_cms_addresses(cols, depth, width)).alias("d", "w")
        )
        .groupBy(*g, "d", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Counter-wise sum — the lossless CMS union (estimates over the
    merged sketch equal estimates over a sketch of the unioned data,
    exactly; pinned by test).  Per group when the sketches carry group
    columns."""
    g = list(group_cols or [])
    u = functools.reduce(DataFrame.unionByName, sketches)
    return u.groupBy(*g, "d", "w").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    cols: list[str],
    depth: int = 4,
    width: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys`` (same
    ``cols`` layout): (keys..., cms_count long) where cms_count =
    min over hash rows of the addressed counter.  The published
    guarantee: NEVER an undercount, and overcount ≤ e·N/width with
    probability 1 − e^-depth — both pinned by test.  The lookup is a
    broadcast-sized join against the ≤ depth×width counter relation,
    never a scan of the data.  ``depth``/``width`` MUST match the
    build's (the addressing is parameter-dependent); the detectable
    mismatch direction fails loudly.

    ``group_cols``: grouped lookups against a grouped sketch — ``keys``
    carries (group…, cols…) rows and each is estimated within its own
    group's counters.  The counter relation stays broadcast: its size
    is groups × depth × width, and the operator targets bounded group
    cardinalities (languages, sources, shards — the corpus-triage
    shape); an unbounded group domain needs the exact groupBy anyway."""
    g = list(group_cols or [])
    # geometry guard evaluated while BUILDING the broadcast relation —
    # every counter row passes through it, no separate validation job
    checked = counters.select(
        *g,
        "d",
        "w",
        F.coalesce(
            _geometry_guard(F.col("w"), width, "cms_estimate"),
            _geometry_guard(F.col("d"), depth, "cms_estimate"),
            F.col("cnt"),
        ).alias("cnt"),
    )
    addressed = keys.select(
        *g,
        *cols,
        F.posexplode(_cms_addresses(cols, depth, width)).alias("d", "w"),
    )
    return (
        addressed.join(F.broadcast(checked), g + ["d", "w"], "left")
        .groupBy(*g, *cols)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_count")
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    cols: list[str],
    row_id: Column,
    threshold: float,
    sample_mod: int = 16,
    depth: int = 4,
    width: int = 2048,
    counters: DataFrame | None = None,
    n_total: int | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Heavy-hitter ENUMERATION over the Count-Min sketch (VERDICT r6
    ask #5: :func:`cms_estimate` answers point queries for keys the
    caller already knows; the operator a 100 TB user actually reaches
    for — top tokens/domains/hosts without an exact global groupBy —
    needs the candidate SET too).  The classic sampled+CMS composition:

    1. **candidates** — a deterministic ROW sample (``row_id`` hashed
       by the t16 md5-modulus discipline; pass a row-unique expression,
       e.g. concat of the source row's natural key) keeps ~N/sample_mod
       rows; the distinct keys appearing in it are the candidate set.
       A key with true frequency f is absent with probability
       (1 - 1/sample_mod)^f — vanishing for every key near the
       threshold at scale (f >= threshold·N), which is the composition's
       one probabilistic miss mode;
    2. **estimate + filter** — candidates are estimated against the
       FULL-data sketch (``counters`` — pass a prebuilt/merged sketch
       to reuse one, e.g. a day's worth of cms_merge'd shards; built
       from ``df`` when None) and kept when the estimate reaches
       ``ceil(threshold · N)``.

    The surviving guarantee is one-sided, inherited from CMS's
    never-undercount: **every candidate whose true frequency >=
    threshold·N is returned** (its estimate >= its true count >= the
    bar) — no false negatives past the sampler.  False positives are
    keys within the sketch's overcount (<= e·N/width with prob.
    1 - e^-depth) of the bar; size ``width >> e/threshold`` to keep
    them away from it.  Returns (cols..., cms_count) — candidates only,
    so the output is ~N·threshold-ish rows, never the key universe.

    Everything is deterministic for given data (md5 sampling, md5
    addressing), hence engine-replayable — the t70b oracle re-runs the
    whole composition in SQL.  ``n_total`` skips the one count action
    when the caller already knows N.

    ``group_cols`` (VERDICT r7 ask #5): per-GROUP heavy hitters — "top
    domains per language", "top tokens per source", the form corpus
    triage actually takes at 100 TB, where a global bar both drowns
    small groups and admits nothing from them.  Each group gets its
    own sketch (shared geometry, one scan), its own candidate sample,
    and its own bar ``ceil(threshold · N_group)`` with N_group the
    group's row count (NULL-key rows included, mirroring the global
    N = count(*); NULL-GROUP rows are out entirely, as in cms_build).
    Output: (group…, cols…, cms_count).  The one-sided guarantee
    holds per group — every key reaching its group's bar is returned,
    modulo the sampler.  State ≤ groups × depth × width counter rows;
    ``n_total`` is a global-path-only shortcut (loud otherwise)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(
            f"cms_heavy_hitters: threshold must be in (0, 1] (got "
            f"{threshold})"
        )
    if sample_mod < 1:
        raise ValueError("cms_heavy_hitters: sample_mod must be >= 1")
    from .dedup import md5_hash32

    g = list(group_cols or [])
    if g and n_total is not None:
        raise ValueError(
            "cms_heavy_hitters: n_total is the global-path shortcut; "
            "per-group totals are computed from the data"
        )
    if counters is None:
        counters = cms_build(df, cols, depth, width, group_cols=g)
    # NULL-key rows mirror cms_build's exclusion: the sketch never
    # counted them, so they must not become candidates either (a NULL
    # key would otherwise inherit the empty-string key's counters
    # through concat_ws's NULL collapse — self-review r7)
    not_null = functools.reduce(
        Column.__and__, (F.col(c).isNotNull() for c in g + cols)
    )
    hkey = md5_hash32(row_id.cast("string"))
    cand = (
        df.filter(not_null & (hkey % sample_mod == 0))
        .select(*g, *cols)
        .distinct()
    )
    est = cms_estimate(counters, cand, cols, depth, width, group_cols=g)
    if not g:
        n = int(n_total) if n_total is not None else df.count()
        need = math.ceil(threshold * n)
        return est.filter(F.col("cms_count") >= F.lit(need))
    not_null_g = functools.reduce(
        Column.__and__, (F.col(c).isNotNull() for c in g)
    )
    bars = (
        df.filter(not_null_g)
        .groupBy(*g)
        .agg(
            F.ceil(F.lit(float(threshold)) * F.count(F.lit(1)))
            .cast("long")
            .alias("_hh_need")
        )
    )
    return (
        est.join(F.broadcast(bars), g)
        .filter(F.col("cms_count") >= F.col("_hh_need"))
        .select(*g, *cols, "cms_count")
    )


# ------------------------------------------------- histogram quantiles

def hist_build(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 128,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram sketch over ``[lo, hi]`` as (bin int,
    cnt long) — the one-pass, mergeable (bin-wise sum) alternative to
    exact percentiles, which at 100 TB need a full sort or a
    full-width percentile_approx state.  Out-of-range values clamp to
    the edge bins (they still count; their position error is the
    documented trade).  Bin arithmetic is floor division over doubles
    — deterministic and SQL-replayable.

    ``group_cols``: per-group histograms in the SAME scan — output
    (group…, bin, cnt), state ≤ groups × bins rows.  Bin edges are
    shared across groups (one global [lo, hi] spec), which is what
    keeps per-group sketches mergeable into the global one."""
    if bins < 1 or hi <= lo:
        raise ValueError("hist_build: need bins >= 1 and hi > lo")
    g = list(group_cols or [])
    w = (float(hi) - float(lo)) / float(bins)
    x = F.col(col).cast("double")
    # clamp BEFORE the int cast: a far outlier's raw index can exceed
    # int range, and under ANSI mode (Spark 4 default) the cast would
    # then kill the job instead of clamping as documented
    b = F.floor((x - F.lit(float(lo))) / F.lit(w))
    bin_ = F.least(
        F.greatest(b, F.lit(0).cast("long")),
        F.lit(bins - 1).cast("long"),
    ).cast("int")
    return (
        df.filter(x.isNotNull())
        .select(*g, bin_.alias("bin"))
        .groupBy(*g, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Bin-wise sum — lossless histogram union (per group when the
    sketches carry group columns)."""
    g = list(group_cols or [])
    u = functools.reduce(DataFrame.unionByName, sketches)
    return u.groupBy(*g, "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def hist_quantile(
    hist: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 128,
    ndigits: int = 4,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from the histogram: (q double, est double).
    For each requested quantile the first bin whose cumulative count
    reaches ``ceil(q·N)`` is chosen and its UPPER edge reported — a
    deterministic rule (no within-bin interpolation, so the answer
    depends only on integer counts and literal edges, replayable in
    any engine).  Error ≤ one bin width by construction — pinned
    against the exact percentile by test and gate.

    ``group_cols``: per-group quantiles from a grouped histogram —
    output (group…, q, est), the rule applied within each group over
    its own cumulative counts (a bounded ≤ bins-row window per group,
    never a global sort).  The global form is the same code with an
    empty partitioning — its windows span the one ≤ bins-row
    histogram, so the single-partition exchange is bounded by
    construction."""
    g = list(group_cols or [])
    w = (float(hi) - float(lo)) / float(bins)
    cum = hist.select(
        *g,
        "bin",
        F.sum("cnt").over(
            Window.partitionBy(*g)
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(*g).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    # ONE aggregation pass for every requested quantile (the previous
    # per-q unionAll recomputed the cumulative window and upstream
    # histogram once per quantile — guide §2.4, duplicated subtrees):
    # per q, a conditional min over the same cumulative rows picks the
    # identical first-reaching bin; the (q, qbin) pairs then unpivot
    # via one explode.  The all-NULL row a zero-key groupBy emits on an
    # empty relation carries NULL qbins, which the isNotNull filter
    # drops — the same empty-histogram contract as before.
    mins = cum.groupBy(*g).agg(
        *[
            F.min(
                F.when(
                    F.col("cum")
                    >= F.ceil(F.lit(float(q)) * F.col("total")),
                    F.col("bin"),
                )
            ).alias(f"_qbin_{i}")
            for i, q in enumerate(qs)
        ]
    )
    return (
        mins.select(
            *g,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(float(q)).alias("q"),
                            F.col(f"_qbin_{i}").alias("qbin"),
                        )
                        for i, q in enumerate(qs)
                    ]
                )
            ).alias("_qq"),
        )
        .filter(F.col("_qq.qbin").isNotNull())
        .select(
            *g,
            F.col("_qq.q").alias("q"),
            quant(
                F.lit(float(lo)) + (F.col("_qq.qbin") + 1) * F.lit(w),
                ndigits,
            ).alias("est"),
        )
    )
