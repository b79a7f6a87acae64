"""Cross-engine deterministic numeric expression helpers.

Why these exist: the driver hash-compares Spark results against a DuckDB
oracle.  Two sources of nondeterminism must be engineered away
(SURVEY.md §4 "semantic potholes", F15):

1. ``SUM(double)`` is order-dependent (floating addition is not
   associative), and Spark/DuckDB reduce in different orders.  Fix: cast the
   per-row expression to DECIMAL and sum exactly — order-independent and
   bit-identical across engines.  Per-row double→decimal casts cannot hit
   rounding ties for practical values (a tie at scale 4 requires the double
   to be exactly k/(2^5·5^4), vanishingly rare), so both engines produce the
   same decimals.

2. ``ROUND(double, n)`` semantics differ: Spark rounds the shortest decimal
   representation HALF_UP (BigDecimal.valueOf), DuckDB rounds the scaled
   binary value.  E.g. round(12.345, 2) → 12.35 in Spark, 12.34 in DuckDB.
   Fix: quantize with ``floor(x*100 + 0.5)/100`` — pure IEEE arithmetic,
   bit-identical everywhere.  (Rounds half toward +inf; convention is
   irrelevant, determinism is the point.)

The SQL_* twins emit the same computation in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"
DEC6 = "decimal(18,6)"


def dsum(expr: Column, dec: str = DEC) -> Column:
    """Order-independent exact sum: per-row cast to decimal, then SUM."""
    return F.sum(expr.cast(dec))


def quant(expr: Column, ndigits: int) -> Column:
    """Engine-agnostic quantization: floor(x*10^n + 0.5) / 10^n as double."""
    p = float(10**ndigits)
    return F.floor(expr.cast("double") * p + F.lit(0.5)) / F.lit(p)


def r2(expr: Column) -> Column:
    return quant(expr, 2)


def r4(expr: Column) -> Column:
    return quant(expr, 4)


def money_sum(expr: Column) -> Column:
    """SUM of a money expression, exact, emitted as 2dp double."""
    return r2(dsum(expr))


def mean2(expr: Column, count: Column) -> Column:
    """Deterministic AVG at 2dp: exact decimal sum / count."""
    return r2(dsum(expr).cast("double") / count)


def safe_pct(num: Column, den: Column, ndigits: int = 4) -> Column:
    """100*num/den with divide-by-zero → NULL (reference's NULLIF guard,
    analytical_queries.sql:63,124)."""
    d = den.cast("double")
    return quant(F.when(d != 0, num.cast("double") * 100.0 / d), ndigits)


# ---------------------------------------------------------------- SQL twins

def SQL_DSUM(x: str, dec: str = "DECIMAL(18,4)") -> str:
    return f"SUM(CAST(({x}) AS {dec}))"


def SQL_QUANT(x: str, ndigits: int) -> str:
    p = 10**ndigits
    return f"FLOOR(CAST(({x}) AS DOUBLE) * {p} + 0.5) / {p}.0"


def SQL_R2(x: str) -> str:
    return SQL_QUANT(x, 2)


def SQL_R4(x: str) -> str:
    return SQL_QUANT(x, 4)


def SQL_MONEY_SUM(x: str) -> str:
    return SQL_R2(SQL_DSUM(x))


def SQL_MEAN2(x: str, count: str) -> str:
    return SQL_R2(f"CAST({SQL_DSUM(x)} AS DOUBLE) / ({count})")


def SQL_SAFE_PCT(num: str, den: str, ndigits: int = 4) -> str:
    return SQL_QUANT(
        f"CAST(({num}) AS DOUBLE) * 100.0 / NULLIF(CAST(({den}) AS DOUBLE), 0)",
        ndigits,
    )


def approx_distinct(col: Column, rsd: float = 0.01) -> Column:
    """HyperLogLog++ distinct count — the scale-out swap for
    countDistinct when key cardinality makes the exact two-phase
    aggregation the bottleneck (SURVEY.md A2 notes this as the documented
    option).  Not used in oracle-gated queries (approximation has no
    cross-engine twin); callers opt in per query."""
    return F.approx_count_distinct(col, rsd)


def plan_guard(fire: Column, *message: Column) -> Column:
    """In-plan validation: NULL when ``fire`` is false, raise_error
    with the concatenated ``message`` columns when true — designed to
    be F.coalesce()-folded into the expression whose value the guard
    protects, so validation costs ZERO extra jobs and fails before any
    guarded value can be consumed.  The shared home of the idiom
    sketch._geometry_guard and quantize._subvectors both use (a NULL
    ``fire`` is treated as false — make NULL-input misuse explicit in
    the condition, e.g. via coalesce, when NULL must also fire)."""
    return F.when(
        F.coalesce(fire, F.lit(False)),
        F.raise_error(F.concat(*message)),
    )
