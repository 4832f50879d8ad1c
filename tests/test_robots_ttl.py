"""robots cache TTL (config.robots_ttl_waves) — cache rows age out,
stale hosts are re-fetched, readers take latest-wins.

RFC 9309 §2.4 allows caching robots "up to 24 hours"; a long crawl must
re-honor changed rules.  North-rule extension (the reference has no
robots at all); None = cache-forever parity with the pre-TTL engine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler import robots as robots_mod
from crawler import schemas, synth
from crawler.config import CrawlConfig
from crawler.loop import Crawl
from crawler.oracle import Oracle
from tests.test_e2e_crawl import _assert_equivalent


def test_latest_wins_view(spark):
    rows = [
        ("a.com", [], None, [], 0),
        ("a.com", [], 500, ["http://a.com/sm.xml"], 3),
        ("b.com", [], None, [], 1),
    ]
    df = spark.createDataFrame(rows, schemas.ROBOTS_CACHE)
    got = {
        r["host"]: (r["crawl_delay_ms"], r["fetched_wave"])
        for r in robots_mod.latest(df).collect()
    }
    assert got == {"a.com": (500, 3), "b.com": (None, 1)}


def test_stale_rows_requested_again(spark):
    pending = spark.createDataFrame(
        [("a.com", "a.com", "http://a.com/x"), ("b.com", "b.com", "http://b.com/y")],
        "host string, tpd string, url string",
    )
    cache = spark.createDataFrame(
        [("a.com", [], None, [], 0), ("b.com", [], None, [], 5)],
        schemas.ROBOTS_CACHE,
    )
    # no TTL: both cached, nothing requested
    assert robots_mod._robots_requests(pending, cache).count() == 0
    # fresh_after=2: a.com's row (wave 0) is stale → re-requested
    got = [
        r["host"]
        for r in robots_mod._robots_requests(pending, cache, fresh_after=2).collect()
    ]
    assert got == ["a.com"]


def test_ttl_equivalence_and_refetch(spark, wh_root):
    """Multi-host graph, robots on, TTL short enough that long-pending
    hosts age out mid-crawl: engine ≡ oracle, and the cache table shows
    the refetches actually happened (≥2 rows for some host)."""
    cfg = CrawlConfig(
        per_domain_delay_ms=100, wave_ms=300, seed_url_seen=True,
        max_waves=14, bloom_shards=16, skew_salt_buckets=4,
        fetch_robots=True, robots_ttl_waves=3,
    )
    pages_pd, docs_pd = synth.multihost_fixture(
        n_hosts=10, pages_per_host=6, mega_host_pages=40
    )
    pages, docs = synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd)
    seeds = ["http://h000.com/p/0", "http://mega.com/p/0"]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, pages, docs)
    c.run()
    orc = Oracle(pages_pd, docs_pd, cfg)
    o = orc.run(seeds)
    _assert_equivalent(spark, c, o)
    per_host = {
        r["host"]: r["n"]
        for r in c._read("robots_cache").groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert max(per_host.values()) >= 2, per_host  # a refetch happened
    # and the oracle agrees on who was refetched late: every host whose
    # cache has k rows was fetched k times ⇒ its last fetched_wave in
    # the engine matches the oracle's robots_fw
    last_fw = {
        r["host"]: r["fw"]
        for r in c._read("robots_cache")
        .groupBy("host")
        .agg(F.max("fetched_wave").alias("fw"))
        .collect()
    }
    assert last_fw == dict(orc.robots_fw)


def test_ttl_validation():
    with pytest.raises(ValueError, match="robots_ttl_waves"):
        CrawlConfig(fetch_robots=True, robots_ttl_waves=0)
    with pytest.raises(ValueError, match="fetch_robots"):
        CrawlConfig(robots_ttl_waves=4)


def test_ttl_compaction_bounds_cache_growth(spark, wh_root):
    """VERDICT r3 item 4: with robots_ttl_waves set the cache is
    append-only between compactions; on the compact_every_waves cadence
    it is rewritten latest-wins, so final row count is bounded by the
    host set (+ at most one refetch per host since the last
    compaction), NOT by refetch events — and the crawl itself is
    unchanged (engine ≡ oracle)."""
    cfg = CrawlConfig(
        per_domain_delay_ms=100, wave_ms=300, seed_url_seen=True,
        max_waves=14, bloom_shards=16, skew_salt_buckets=4,
        fetch_robots=True, robots_ttl_waves=3, compact_every_waves=2,
    )
    pages_pd, docs_pd = synth.multihost_fixture(
        n_hosts=10, pages_per_host=6, mega_host_pages=40
    )
    pages, docs = synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd)
    seeds = ["http://h000.com/p/0", "http://mega.com/p/0"]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, pages, docs)
    c.run()
    orc = Oracle(pages_pd, docs_pd, cfg)
    o = orc.run(seeds)
    _assert_equivalent(spark, c, o)
    cache = c._read("robots_cache")
    n_hosts = cache.select("host").distinct().count()
    # ttl(3) > compaction cadence(2) ⇒ ≤1 refetch row per host can
    # accumulate on top of the compacted row before the next rewrite
    assert cache.count() <= 2 * n_hosts, (cache.count(), n_hosts)
    per_host = {
        r["host"]: r["n"]
        for r in cache.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert max(per_host.values()) <= 2, per_host
    # freshest row per host survives compaction exactly
    last_fw = {
        r["host"]: r["fw"]
        for r in cache.groupBy("host").agg(F.max("fetched_wave").alias("fw")).collect()
    }
    assert last_fw == dict(orc.robots_fw)
