"""Hashing kernel.

north_rule: URL-seen keys are canonicalized + murmur3-hashed.  We use
Spark's *built-in* murmur3 (`F.hash`, Murmur3_x86_32 seed 42 — JVM-side,
whole-stage-codegen'd; never per-row Python in the hot path) as bloom
hash h1, `F.xxhash64` as h2 and as the 64-bit row key, and
Kirsch-Mitzenmacher double hashing g_i = h1 + i*h2 for the k bloom
probes — the same scheme Guava's BloomFilter uses internally
(reference: DuplicateFilter.scala:51 uses Guava with murmur3_128).

`murmur3_32` below is a pure-Python twin of Spark's implementation
(including Spark's nonstandard per-byte tail mixing) used only by the
single-threaded oracle and by tests that pin JVM/Python hash parity.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, functions as F

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes | str, seed: int = 42) -> int:
    """Spark-compatible Murmur3_x86_32 (signed int32 result).

    Matches org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes:
    4-byte little-endian blocks, then each remaining byte is sign-extended
    and run through a FULL mixK1+mixH1 round (unlike canonical murmur3,
    which folds the tail into a single k1).  Verified against F.hash in
    tests/test_hashing.py.
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    h1 = seed & _M32
    n4 = (len(data) // 4) * 4
    for i in range(0, n4, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        k1 = (k1 * _C1) & _M32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2) & _M32
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _M32
    for i in range(n4, len(data)):
        b = data[i]
        if b >= 0x80:
            b -= 0x100  # sign-extend like Java's (int) byte
        k1 = (b & _M32) * _C1 & _M32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2) & _M32
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _M32
    # fmix
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


# ---------------------------------------------------------------- Spark exprs


def h1_expr(col: str | Column) -> Column:
    """Bloom hash 1: built-in murmur3 (int32, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hash(c)


def h2_expr(col: str | Column) -> Column:
    """Bloom hash 2 / 64-bit row key: built-in xxhash64 (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def shard_expr(tpd_col: str | Column, n_shards: int) -> Column:
    """Bloom shard id, co-partitioned with the politeness key so the
    wave's candidate partition and its shard blob meet in one shuffle."""
    c = F.col(tpd_col) if isinstance(tpd_col, str) else tpd_col
    return F.pmod(F.hash(c), F.lit(n_shards)).cast("int")


# ---------------------------------------------------------------- bloom math


def bloom_params(expected_insertions: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) — same formulas Guava uses
    (optimalNumOfBits / optimalNumOfHashFunctions)."""
    n = max(1, expected_insertions)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 7) // 8 * 8)  # byte-align
    k = max(1, round(m / n * math.log(2)))
    return m, k


def bloom_positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """Kirsch-Mitzenmacher probe positions, shape (len, k), vectorized.

    h1 int32-valued, h2 int64-valued arrays (as delivered by F.hash /
    F.xxhash64 through Arrow).  All arithmetic in uint64 then mod m.
    """
    h1u = h1.astype(np.int64).astype(np.uint64)
    h2u = h2.astype(np.uint64)
    i = np.arange(1, k + 1, dtype=np.uint64)
    combined = h1u[:, None] + i[None, :] * h2u[:, None]  # wraps mod 2^64
    return (combined % np.uint64(m_bits)).astype(np.int64)
