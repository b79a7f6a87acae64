"""Pure-Python XXH64 — an INDEPENDENT second implementation of the hash
family Spark's ``xxhash64`` expression computes, used to cross-check the
static-expected oracles (t8/t9/t15) against something other than the
Spark plan that generated them (tests/test_static_oracle_independence.py).

Implements the public XXH64 algorithm (Yann Collet's reference spec,
github.com/Cyan4973/xxHash) plus the two fixed-width primitive paths and
the multi-column fold Spark's catalyst expression applies:

- strings hash as XXH64 over their UTF-8 bytes,
- int32 / int64 values use the specialized 4- and 8-byte paths,
- a multi-argument ``xxhash64(c1, c2, …)`` folds left with the running
  hash as the next seed, starting from seed 42.

Everything is arbitrary-precision Python int arithmetic masked to 64
bits — no JVM, no Spark, no C extension; that independence is the point.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Reference XXH64 over a byte string (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    seed &= _M
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_int32(value: int, seed: int) -> int:
    """Spark's specialized 4-byte path (IntegerType operands)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxh64_int64(value: int, seed: int) -> int:
    """Spark's specialized 8-byte path (LongType operands)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*values: str | int | tuple[str, int]) -> int:
    """Fold-left over the operands exactly as Spark's ``xxhash64(...)``
    expression does (running hash seeds the next operand), returning the
    SIGNED 64-bit value Spark yields.

    Operand typing: ``str`` → UTF-8 bytes path; plain ``int`` → LongType
    path; ``("i32", n)`` tuple → IntegerType path (Spark hashes int and
    long columns differently, so the caller must say which it meant).
    """
    h = SPARK_SEED
    for v in values:
        if isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, tuple) and v[0] == "i32":
            h = xxh64_int32(v[1], h)
        elif isinstance(v, int) and not isinstance(v, bool):
            h = xxh64_int64(v, h)
        else:
            raise TypeError(f"unsupported operand for spark_xxhash64: {v!r}")
    return _signed(h)
