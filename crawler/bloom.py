"""Sharded bloom filter + cuckoo tier — the distributed URL-seen state.

Reference semantics: a single in-JVM Guava BloomFilter, 1e6 expected
insertions @ fpp 1e-4, first-wins membership
(DuplicateFilter.scala:16-22,51-60).  That is single-node state; here it
becomes N_SHARDS blob rows (shard_id = pmod(murmur3(tpd), N)) stored in
the warehouse and updated once per wave, so each shard blob is
co-partitioned with the frontier rows that probe it — probe and update
happen in ONE cogrouped shuffle per wave, never on the driver.

Blob math is numpy over the whole Arrow batch (no per-row Python):
Kirsch-Mitzenmacher double hashing g_i = h1 + i*h2 (the same scheme
Guava uses), h1 = Spark murmur3 (`F.hash`), h2 = `F.xxhash64`, both
computed JVM-side.

The cuckoo tier holds DELETABLE entries (north_rule): partial-key cuckoo
hashing, 4-slot buckets, 16-bit fingerprints.  The crawl uses it as a
tombstone set — `forget`-ing a URL inserts its fingerprint, and the
dedup stage treats tombstoned URLs as unseen (re-crawlable) until the
next compaction removes them from the exact table.  Deletion support is
what blooms can't do (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014).
"""

from __future__ import annotations

import numpy as np

from .hashing import bloom_params, bloom_positions

# ------------------------------------------------------------------ bloom


def new_bloom(m_bits: int) -> bytes:
    return bytes(m_bits // 8)


def bloom_add(blob: bytes, h1: np.ndarray, h2: np.ndarray, k: int) -> bytes:
    """Set k bits per key; whole batch vectorized."""
    arr = np.frombuffer(bytearray(blob), dtype=np.uint8).copy()
    m_bits = len(blob) * 8
    pos = bloom_positions(h1, h2, k, m_bits).ravel()
    np.bitwise_or.at(arr, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return arr.tobytes()


def bloom_contains(blob: bytes, h1: np.ndarray, h2: np.ndarray, k: int) -> np.ndarray:
    """bool array — True = maybe-seen, False = definitely new."""
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    arr = np.frombuffer(blob, dtype=np.uint8)
    m_bits = len(blob) * 8
    pos = bloom_positions(h1, h2, k, m_bits)  # (n, k)
    bits = (arr[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def shard_bloom_bits(expected_insertions: int, fpp: float, n_shards: int) -> tuple[int, int]:
    """(m_bits per shard, k) sized so the whole sharded filter matches the
    reference's capacity/fpp envelope."""
    per_shard = max(1, expected_insertions // n_shards)
    return bloom_params(per_shard, fpp)


# ----------------------------------------------------------------- cuckoo

_CK_BUCKET = 4  # slots per bucket
_FP_MASK = np.uint64(0xFFFF)


def new_cuckoo(n_slots: int) -> bytes:
    """n_slots must be a power-of-two multiple of bucket size; slot value
    0 = empty, else 16-bit fingerprint."""
    assert n_slots % _CK_BUCKET == 0
    n_buckets = n_slots // _CK_BUCKET
    assert n_buckets & (n_buckets - 1) == 0, "bucket count must be a power of two"
    return bytes(n_slots * 2)


def _ck_parts(blob: bytes) -> tuple[np.ndarray, int]:
    arr = np.frombuffer(bytearray(blob), dtype=np.uint16).reshape(-1, _CK_BUCKET).copy()
    return arr, arr.shape[0]


def _ck_fp_and_buckets(h2: np.ndarray, n_buckets: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    h = h2.astype(np.uint64)
    fp = ((h >> np.uint64(48)) & _FP_MASK).astype(np.uint64)
    fp = np.where(fp == 0, np.uint64(1), fp)  # 0 is the empty marker
    nb = np.uint64(n_buckets)
    i1 = (h & np.uint64(n_buckets - 1)).astype(np.uint64)
    # partial-key displacement: i2 = i1 xor hash(fp)
    i2 = (i1 ^ ((fp * np.uint64(0x5BD1E995)) & np.uint64(n_buckets - 1))) % nb
    return fp.astype(np.uint16), i1.astype(np.int64), i2.astype(np.int64)


def cuckoo_add(
    blob: bytes, h2: np.ndarray, max_kicks: int = 500, max_load: float = 0.95
) -> tuple[bytes, int]:
    """Insert fingerprints; returns (new blob, n_failed). Row-wise loop —
    the cuckoo tier holds the *deletable minority* (tombstones), orders of
    magnitude smaller than the bloom-side volume.

    Saturation guard (r5): a recrawl-heavy wave can tombstone far more
    keys than the table holds (a full-corpus TTL expiry presents
    n_urls/shard inserts to a slots_per_shard table).  Past ``max_load``
    occupancy, eviction kicks are futile — every insert walks
    ``max_kicks`` displacement hops and still fails, which measured
    MINUTES per shard at 200k inserts into 65k slots.  Tombstones are
    advisory (bloom_probe never lets the cuckoo verdict bypass the
    exact backstop — ADVICE r3), so once occupancy crosses the
    threshold the remaining inserts fail fast in one vectorized batch:
    same semantics an individually-failing insert has, without the
    eviction burn."""
    arr, nb = _ck_parts(blob)
    fps, i1s, i2s = _ck_fp_and_buckets(h2, nb)
    rng = np.random.RandomState(42)  # deterministic kick choice
    occ = int(np.count_nonzero(arr))
    limit = int(arr.size * max_load)
    failed = 0
    for idx, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
        if occ >= limit:
            rest_fp, rest_i1, rest_i2 = fps[idx:], i1s[idx:], i2s[idx:]
            present = (arr[rest_i1] == rest_fp[:, None]).any(axis=1) | (
                arr[rest_i2] == rest_fp[:, None]
            ).any(axis=1)
            failed += int((~present).sum())
            break
        if fp in arr[i1] or fp in arr[i2]:
            continue  # already present (set semantics)
        placed = False
        for b in (i1, i2):
            empty = np.where(arr[b] == 0)[0]
            if len(empty):
                arr[b, empty[0]] = fp
                placed = True
                break
        if placed:
            occ += 1
            continue
        cur_fp, cur_b = fp, i1
        for _ in range(max_kicks):
            slot = rng.randint(_CK_BUCKET)
            cur_fp, arr[cur_b, slot] = arr[cur_b, slot], cur_fp
            alt = (cur_b ^ int((np.uint64(cur_fp) * np.uint64(0x5BD1E995)) & np.uint64(nb - 1))) % nb
            empty = np.where(arr[alt] == 0)[0]
            if len(empty):
                arr[alt, empty[0]] = cur_fp
                placed = True
                break
            cur_b = alt
        if placed:
            occ += 1
        else:
            failed += 1
    return arr.tobytes(), failed


def cuckoo_delete(blob: bytes, h2: np.ndarray) -> bytes:
    """Zero every slot in either candidate bucket holding the key's
    fingerprint — vectorized (r5: this runs in update_bloom's per-wave
    re-add path over EVERY new key, where a row-wise loop cost ~1s per
    200k-key shard).  Insertion has set semantics (at most one stored
    copy per (fp, bucket-pair)), so zeroing all matches equals the
    row-wise first-match delete; in the rare eviction-built state where
    a colliding fp holds two slots, deleting both is the advisory
    tier's safe direction (a cleared tombstone never bypasses the
    backstop)."""
    if len(h2) == 0:
        return blob
    arr, nb = _ck_parts(blob)
    fps, i1s, i2s = _ck_fp_and_buckets(h2, nb)
    for idx in (i1s, i2s):
        r, c = np.nonzero(arr[idx] == fps[:, None])
        if len(r):
            arr[idx[r], c] = 0
    return arr.tobytes()


def cuckoo_contains(blob: bytes, h2: np.ndarray) -> np.ndarray:
    if len(h2) == 0:
        return np.zeros(0, dtype=bool)
    arr, nb = _ck_parts(blob)
    fps, i1s, i2s = _ck_fp_and_buckets(h2, nb)
    in1 = (arr[i1s] == fps[:, None]).any(axis=1)
    in2 = (arr[i2s] == fps[:, None]).any(axis=1)
    return in1 | in2
