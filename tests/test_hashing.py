"""Hash parity + bloom/cuckoo unit tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler import bloom as B
from crawler.hashing import bloom_params, murmur3_32

VECTORS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "http://localhost:9090/crawl/1",
    "http://blog.amazon.co.jp/some/path?q=1#frag",
    "ünïcödé-ß∂ƒ",
    "x" * 1000,
]


def test_murmur3_matches_spark_hash(spark):
    df = spark.createDataFrame([(v,) for v in VECTORS], "s string")
    got = [r["h"] for r in df.select(F.hash("s").alias("h")).collect()]
    want = [murmur3_32(v) for v in VECTORS]
    assert got == want


def test_bloom_params_guava_envelope():
    m, k = bloom_params(1_000_000, 1e-4)
    # Guava: optimalNumOfBits(1e6, 1e-4) = 19170116 bits, k = 13.
    # Our blob is a numpy byte array, so m is Guava's value rounded UP
    # to the next multiple of 8: ceil(19170116 / 8) * 8 = 19170120.
    # Exact, not slack: alignment can only add 0-7 bits, and adding
    # bits only lowers the realized fpp below the target.
    assert m == 19170120
    assert m - 19170116 == 4  # the alignment pad for this (n, fpp)
    assert k == 13


def test_bloom_add_contains_no_false_negatives():
    m, k = bloom_params(1000, 1e-4)
    blob = B.new_bloom(m)
    rng = np.random.RandomState(42)
    h1 = rng.randint(-(2**31), 2**31, size=500).astype(np.int64)
    h2 = rng.randint(-(2**62), 2**62, size=500).astype(np.int64)
    blob = B.bloom_add(blob, h1, h2, k)
    assert B.bloom_contains(blob, h1, h2, k).all()
    # fresh keys: nearly all negative at this fpp
    o1 = rng.randint(-(2**31), 2**31, size=500).astype(np.int64)
    o2 = rng.randint(-(2**62), 2**62, size=500).astype(np.int64)
    assert B.bloom_contains(blob, o1, o2, k).mean() < 0.01


def test_cuckoo_add_delete_contains():
    blob = B.new_cuckoo(1024)
    rng = np.random.RandomState(7)
    keys = rng.randint(-(2**62), 2**62, size=300).astype(np.int64)
    blob, failed = B.cuckoo_add(blob, keys)
    assert failed == 0
    assert B.cuckoo_contains(blob, keys).all()
    # delete half, they must disappear; the rest must remain
    blob = B.cuckoo_delete(blob, keys[:150])
    assert not B.cuckoo_contains(blob, keys[:150]).any() or (
        # fingerprint collisions may keep a few "present" — bounded
        B.cuckoo_contains(blob, keys[:150]).mean() < 0.05
    )
    assert B.cuckoo_contains(blob, keys[150:]).all()


def test_cuckoo_idempotent_add():
    blob = B.new_cuckoo(64)
    keys = np.array([123456789, 123456789, -42], dtype=np.int64)
    blob, _ = B.cuckoo_add(blob, keys)
    arr = np.frombuffer(blob, dtype=np.uint16)
    assert (arr != 0).sum() == 2  # set semantics, no double insert


def test_cuckoo_saturation_guard_fails_fast():
    """r5: a recrawl-heavy wave can tombstone more keys than the table
    holds; past max_load the remaining inserts must fail in bulk (one
    vectorized batch) instead of each burning max_kicks evictions —
    measured minutes-per-shard before the guard.  Semantics: advisory
    failures only, occupancy capped, present keys still detected."""
    import time

    blob = B.new_cuckoo(65536)
    rng = np.random.RandomState(1)
    keys = rng.randint(-(2**62), 2**62, size=200_000).astype(np.int64)
    t0 = time.monotonic()
    out, failed = B.cuckoo_add(blob, keys)
    took = time.monotonic() - t0
    arr = np.frombuffer(out, dtype=np.uint16)
    occ = int((arr != 0).sum())
    # table filled to the load cap, the rest failed (advisory), and the
    # whole batch completed without eviction burn (generous wall bound:
    # pre-guard this took >120s)
    assert occ <= int(65536 * 0.95) + 1
    assert occ + failed >= 199_000  # inserted or counted failed (minus fp dups)
    assert took < 30.0
    # keys that DID land are still queryable
    landed = B.cuckoo_contains(out, keys)
    assert int(landed.sum()) >= occ
    # and a successful delete still clears them
    out2 = B.cuckoo_delete(out, keys)
    assert not B.cuckoo_contains(out2, keys).any()
