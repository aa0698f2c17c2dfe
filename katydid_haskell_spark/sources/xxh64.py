"""Pure-Python XXH64 (the public xxHash algorithm), matching Spark's
``F.xxhash64`` on string columns (XXH64 over UTF-8 bytes, seed 42).

Used to compute the url-hash ``bucket`` column outside Spark — the DuckDB
oracle fixture for the pages suite must reproduce Spark's bucketing
exactly.  Reference: the xxHash specification (public domain); Spark's
XxHash64 expression applies the same algorithm with seed 42.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, val: int) -> int:
    acc = (acc + val * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 digest as an unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k1 = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        h = ((_rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * _P1) & _M,
                    23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Two's-complement view, matching Spark's LongType output."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_string_bucket(s: str, buckets: int, seed: int = 42) -> int:
    """``pmod(xxhash64(col), buckets)`` for a string column."""
    return xxh64_signed(s.encode("utf-8"), seed) % buckets
