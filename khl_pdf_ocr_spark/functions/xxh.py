"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` on (long, int)
inputs — the independent recomputation that lets a DuckDB oracle
hash-gate ``hash_split`` / ``deterministic_sample`` assignments: the
expected split per id is computed HERE (no Spark involved), written as
a golden parquet, and the driver's value-hash compare then checks
Spark's JVM XXH64 against this implementation bit-for-bit.

The algorithm is the public xxHash spec (github.com/Cyan4973/xxHash,
BSD-2) specialized to Spark's streaming variant (one column hashed
with the previous column's hash as seed; 8-byte blocks for longs,
4-byte tail reads for ints — Spark catalyst XXH64 semantics, verified
empirically against ``F.xxhash64`` in tests/test_xxh.py).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

__all__ = ["xxhash64_long", "xxhash64_long_int", "spark_hash_bucket"]


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _hash_long(value: int, seed: int) -> int:
    """One 8-byte block (unsigned domain)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(((value & _M) * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _hash_int(value: int, seed: int) -> int:
    """One 4-byte tail read (unsigned domain)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_long(value: int, seed: int = 42) -> int:
    """``F.xxhash64(long_col)`` (signed 64-bit result)."""
    return _signed(_hash_long(value, seed))


def xxhash64_long_int(long_val: int, int_val: int, seed: int = 42) -> int:
    """``F.xxhash64(long_col, F.lit(int_val))`` — Spark chains columns
    by feeding each column's hash as the next column's seed."""
    return _signed(_hash_int(int_val, _hash_long(long_val, seed)))


def spark_hash_bucket(id_val: int, seed: int, mod: int) -> int:
    """``F.pmod(F.xxhash64(id_col, F.lit(seed)), F.lit(mod))`` for a
    BIGINT id — the exact bucket expression of ``prepare.hash_split``
    and ``prepare.deterministic_sample``."""
    h = xxhash64_long_int(id_val, seed)
    return ((h % mod) + mod) % mod
