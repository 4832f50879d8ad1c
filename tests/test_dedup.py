"""Dedup semantics — golden vector from DuplicateFilterSpec.scala:10-15
plus the bloom-prefilter/exact-backstop machinery and the cuckoo
tombstone (deletable entries) tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler import dedup
from crawler.config import CrawlConfig

CFG = CrawlConfig(bloom_shards=8, bloom_expected_insertions=10_000,
                  cuckoo_slots_per_shard=1024)


def _cand(spark, urls, start_order=0):
    rows = [(u, i + start_order) for i, u in enumerate(urls)]
    df = spark.createDataFrame(rows, "url string, ord long")
    df = dedup.with_url_keys(df, "url", CFG)
    return df


def _empty_seen(spark):
    from crawler import schemas

    return spark.createDataFrame([], schemas.URL_SEEN)


def test_golden_first_wins(spark):
    """["1","2","3","1","2","1","4","4","5"] → ["1","2","3","4","5"]"""
    urls = [f"http://t.example.com/{x}" for x in "123121445"]
    cand = _cand(spark, urls)
    out = dedup.dedup_candidates(
        cand, _empty_seen(spark), dedup.empty_bloom_df(spark, CFG), CFG,
        order_cols=("ord",),
    )
    got = sorted(r["url"] for r in out.collect())
    assert got == sorted(f"http://t.example.com/{x}" for x in "12345")
    # first-wins: the surviving '1' is the FIRST occurrence (ord 0)
    assert out.where(F.col("url").endswith("/1")).collect()[0]["ord"] == 0


def test_cross_wave_membership(spark):
    wave1 = _cand(spark, [f"http://t.example.com/{x}" for x in "123"])
    bloom0 = dedup.empty_bloom_df(spark, CFG)
    new1 = dedup.dedup_candidates(wave1, _empty_seen(spark), bloom0, CFG, ("ord",))
    seen1 = new1.select(
        "url_canon", "url_hash", F.lit(0).cast("int").alias("wave")
    )
    bloom1 = dedup.update_bloom(bloom0, new1, CFG, 0)
    wave2 = _cand(spark, [f"http://t.example.com/{x}" for x in "34512"], 100)
    new2 = dedup.dedup_candidates(wave2, seen1, bloom1, CFG, ("ord",))
    got = sorted(r["url"][-1] for r in new2.collect())
    assert got == ["4", "5"]


def test_canonicalization_collapses_variants(spark):
    """fragment/trailing-slash variants are ONE url after canonicalize."""
    cand = _cand(
        spark,
        ["http://t.example.com/p", "http://t.example.com/p/",
         "http://t.example.com/p#frag"],
    )
    out = dedup.dedup_candidates(
        cand, _empty_seen(spark), dedup.empty_bloom_df(spark, CFG), CFG, ("ord",)
    )
    assert out.count() == 1


def test_bloom_negative_skips_backstop_join(spark):
    """Plan check: the exact anti-join input is only the maybe-seen rows —
    probe a populated bloom and count rows flowing to the join side."""
    first = _cand(spark, [f"http://t.example.com/{i}" for i in range(50)])
    bloom0 = dedup.empty_bloom_df(spark, CFG)
    bloom1 = dedup.update_bloom(bloom0, first, CFG, 0)
    # 10 dupes + 40 fresh
    urls = [f"http://t.example.com/{i}" for i in range(10)] + [
        f"http://t.example.com/new{i}" for i in range(40)
    ]
    probed = dedup.bloom_probe(_cand(spark, urls), bloom1, CFG)
    n_maybe = probed.where("maybe_seen").count()
    assert 10 <= n_maybe <= 12  # true dupes + at most a few fp
    assert probed.where("NOT maybe_seen").count() == 50 - n_maybe


def test_tombstone_cannot_bypass_exact_backstop(spark):
    """ADVICE r3 (high): a cuckoo hit must NOT re-admit a key whose
    url_seen row is still fresh.  The 16-bit partial-key cuckoo has
    false positives, so a live key colliding with an aged-out key's
    fingerprint looks tombstoned to the probe — the exact backstop must
    still block it.  We simulate the collision exactly: tombstone /a's
    own fingerprint while its url_seen row remains fresh."""
    first = _cand(spark, ["http://t.example.com/a", "http://t.example.com/b"])
    bloom0 = dedup.empty_bloom_df(spark, CFG)
    bloom1 = dedup.update_bloom(bloom0, first, CFG, 0)
    seen = first.select("url_canon", "url_hash", F.lit(0).cast("int").alias("wave"))
    forget = first.where(F.col("url").endswith("/a"))
    bloom2 = dedup.forget_urls(bloom1, forget, CFG, 1)
    # probe: tombstones are advisory — bloom verdict unchanged
    probed = dedup.bloom_probe(first, bloom2, CFG)
    m = {r["url"][-1]: r["maybe_seen"] for r in probed.collect()}
    assert m == {"a": True, "b": True}
    # end-to-end: NOTHING re-admitted while both rows are fresh
    out = dedup.dedup_candidates(first, seen, bloom2, CFG, ("ord",))
    assert out.count() == 0


def test_ttl_recrawl_decided_by_backstop_freshness(spark):
    """Re-admission of aged keys is the backstop's freshness filter,
    not the tombstone: /a admitted at wave 0 (aged out at wave 7 with
    ttl=5) is re-admitted; /b admitted at wave 6 (fresh) stays blocked
    even though only /a carries a tombstone."""
    cfg = CrawlConfig(bloom_shards=8, bloom_expected_insertions=10_000,
                      cuckoo_slots_per_shard=1024, recrawl_ttl_waves=5)
    first = _cand(spark, ["http://t.example.com/a", "http://t.example.com/b"])
    bloom1 = dedup.update_bloom(dedup.empty_bloom_df(spark, cfg), first, cfg, 0)
    seen = first.select(
        "url_canon",
        "url_hash",
        F.when(F.col("url").endswith("/a"), F.lit(0))
        .otherwise(F.lit(6))
        .cast("int")
        .alias("wave"),
    )
    bloom2 = dedup.forget_urls(
        bloom1, first.where(F.col("url").endswith("/a")), cfg, 7
    )
    out = dedup.dedup_candidates(first, seen, bloom2, cfg, ("ord",), wave=7)
    assert [r["url"][-1] for r in out.collect()] == ["a"]
    # re-adding /a clears its tombstone (state hygiene on re-admission)
    bloom3 = dedup.update_bloom(bloom2, out, cfg, 7)
    from crawler import bloom as B

    blobs = {r["shard_id"]: r for r in bloom3.collect()}
    a_row = first.where(F.col("url").endswith("/a")).collect()[0]
    ck = bytes(blobs[a_row["shard_id"]]["cuckoo"])
    import numpy as np

    assert not B.cuckoo_contains(ck, np.array([a_row["url_hash"]]))[0]
