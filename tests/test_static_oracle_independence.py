"""Independent verification of the static-expected oracles.

The t8/t9/t15 gates pin Spark's own output as literal VALUES (DuckDB
cannot recompute seeded xxhash64), which on its own is a regression pin,
not a correctness oracle — a wrong hash would be baked into its own
expectation.  This suite closes that loop with a SECOND implementation:
a pure-Python XXH64 (tools/pyxxh64.py) plus a from-scratch Python twin
of each pipeline (shingling, MinHash banding, SimHash voting, winnowing
window minima), compared against the pinned literals the driver gate
replays.  Agreement of three implementations (Spark JVM, pinned VALUES,
pure Python) is what upgrades the pins to verified expectations.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from ecommerce_data_pipeline_23a91a05i4_spark.plans.static_oracles import (
    STATIC_ORACLES,
)
from tools.pyxxh64 import spark_xxhash64

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- text twins

def norm_py(text: str) -> str:
    """Python twin of operators.text.norm_text (Java trim + lower +
    collapse \\s+ runs; Java \\s is the ASCII class)."""
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip().lower())


def shingle_set(text: str, n: int = 2) -> set[str]:
    norm = norm_py(text)
    toks = norm.split(" ")
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {norm}


def load_docs() -> list[tuple[int, str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def oracle_rows(name: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    rows = con.execute(STATIC_ORACLES[name]).fetchall()
    con.close()
    return rows


# ---------------------------------------------------- hash parity vs Spark

def test_pyxxh64_matches_spark_xxhash64(spark):
    """The pure-Python XXH64 must agree with Spark's JVM expression on
    every operand shape the dedup operators use: bare strings, the
    (string, int-seed) MinHash fold, and multi-long band folds."""
    from pyspark.sql import functions as F

    strings = ["", "a", "abc", "hello world", "ü über 北京", "x" * 100]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = df.select(
        F.xxhash64("s").alias("h1"),
        F.xxhash64(F.col("s"), F.lit(7)).alias("h2"),
    ).collect()
    for row, s in zip(got, strings):
        assert row.h1 == spark_xxhash64(s), s
        assert row.h2 == spark_xxhash64(s, ("i32", 7)), s

    longs = [(0, 1, -5, 2**62), (-(2**63), 2**63 - 1, 42, -1)]
    dfl = spark.createDataFrame(longs, ["a", "b", "c", "d"])
    for row, vals in zip(
        dfl.select(F.xxhash64("a", "b", "c", "d").alias("h")).collect(), longs
    ):
        assert row.h == spark_xxhash64(*vals), vals


# -------------------------------------------------------------- t9 SimHash

def _simhash_py(text: str) -> int:
    """Unsigned 64-bit SimHash twin of dedup.simhash_sql (duplicate
    tokens vote multiply, exactly like the transform over the array)."""
    votes = [0] * 64
    for tok in norm_py(text).split(" "):
        u = spark_xxhash64(tok) & ((1 << 64) - 1)
        for b in range(64):
            votes[b] += 1 if (u >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if votes[b] > 0:
            fp |= 1 << b
    return fp


def test_t9_simhash_static_oracle_is_independently_correct():
    docs = load_docs()
    fps = {i: _simhash_py(t) for i, t in docs}
    ids = sorted(fps)
    got = sorted(
        (a, b, (fps[a] ^ fps[b]).bit_count())
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if (fps[a] ^ fps[b]).bit_count() <= 6
    )
    assert got == sorted(tuple(r) for r in oracle_rows("t9_simhash"))
    assert len(got) > 0  # the gate asserts real pairs, not an empty set


# ------------------------------------------------------------- t8 MinHash

def _quant6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_t8_minhash_lsh_static_oracle_is_independently_correct():
    docs = load_docs()
    sh = {i: shingle_set(t) for i, t in docs}
    num_perm, bands, r = 32, 8, 4

    # per-shingle hash row reused across docs (shingles repeat heavily)
    cache: dict[str, list[int]] = {}

    def hashes(s: str) -> list[int]:
        if s not in cache:
            cache[s] = [spark_xxhash64(s, ("i32", i)) for i in range(num_perm)]
        return cache[s]

    sig = {
        i: [min(hashes(s)[k] for s in ss) for k in range(num_perm)]
        for i, ss in sh.items()
    }
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, sg in sig.items():
        for bnd in range(bands):
            key = (bnd, spark_xxhash64(*sg[bnd * r : (bnd + 1) * r]))
            buckets.setdefault(key, []).append(i)
    cands = {
        (a, b)
        for ids in buckets.values()
        for ai, a in enumerate(sorted(ids))
        for b in sorted(ids)[ai + 1 :]
    }
    got = sorted(
        (a, b, _quant6(len(sh[a] & sh[b]) / len(sh[a] | sh[b])))
        for a, b in cands
        if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= 0.3
    )
    assert got == sorted(tuple(r) for r in oracle_rows("t8_minhash_lsh"))
    assert len(got) > 0


# ------------------------------------------------------------ t15 winnow

def _winnow_fps_py(text: str, k: int = 16, window: int = 8) -> set[int]:
    norm = norm_py(text)
    n_grams = max(len(norm) - k + 1, 1)
    grams = [spark_xxhash64(norm[i : i + k]) for i in range(n_grams)]
    n_wins = max(len(grams) - window + 1, 1)
    return {min(grams[i : i + window]) for i in range(n_wins)}


def test_t15_winnow_static_oracle_is_independently_correct():
    docs = load_docs()
    fps = {i: _winnow_fps_py(t) for i, t in docs}
    ids = sorted(fps)
    got = sorted(
        (a, b, len(fps[a] & fps[b]))
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if len(fps[a] & fps[b]) >= 20
    )
    assert got == sorted(tuple(r) for r in oracle_rows("t15_winnow_dedup"))
    assert len(got) > 0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
