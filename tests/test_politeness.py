"""Politeness scheduler semantics — FrontierThrottlerSpec /
RabbitThrottlerSpec timing assertions re-expressed as wave/fetch_ms
order assertions under the logical clock."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler import politeness, schemas
from crawler.config import CrawlConfig


def _pending(spark, rows):
    """rows: (url, tpd, seq) — rest defaulted."""
    data = [
        (u, u, hash(u) % 10**9, u.split("/")[2], tpd, "GET", [], None, [], 0.0, s, 0, 0)
        for (u, tpd, s) in rows
    ]
    return spark.createDataFrame(data, schemas.FRONTIER)


def _state(spark, rows=()):
    return spark.createDataFrame(list(rows), schemas.HOST_STATE)


def _robots(spark, rows=()):
    return spark.createDataFrame(list(rows), schemas.ROBOTS_CACHE)


def test_one_message_per_interval(spark):
    """Exactly one dequeue per tick per TPD (RabbitThrottlerSpec:39-60);
    first tick one interval after schedule creation."""
    cfg = CrawlConfig(per_domain_delay_ms=100, wave_ms=100)
    pend = _pending(
        spark, [(f"http://a.example.com/{i}", "example.com", i) for i in range(3)]
    )
    st = _state(spark)
    # wave 0: schedule created this wave → first tick at t=100 (wave 1)
    s0, _ = politeness.schedule_wave(pend, st, _robots(spark), cfg, 0)
    assert s0.count() == 0
    st1 = politeness.next_host_state(st, pend, s0, cfg, 0)
    s1, _ = politeness.schedule_wave(pend, st1, _robots(spark), cfg, 1)
    rows = s1.collect()
    assert len(rows) == 1  # exactly one per interval
    assert rows[0]["url"] == "http://a.example.com/0"  # FIFO by seq
    assert rows[0]["fetch_ms"] == 100


def test_independent_domains(spark):
    """Schedules per domain are independent (FrontierThrottlerSpec)."""
    cfg = CrawlConfig(per_domain_delay_ms=100, wave_ms=100)
    pend = _pending(
        spark,
        [("http://a.one.com/1", "one.com", 0), ("http://b.two.com/1", "two.com", 0)],
    )
    st = _state(spark, [("one.com", 0, 0), ("two.com", 0, 0)])
    s, _ = politeness.schedule_wave(pend, st, _robots(spark), cfg, 0)
    assert s.count() == 2  # both domains fetch in the same wave


def test_custom_domain_delay(spark):
    """ConfigSpec golden: somedomain.com → 1337ms override."""
    cfg = CrawlConfig(
        per_domain_delay_ms=100, wave_ms=1000, domain_delays={"somedomain.com": 1337}
    )
    pend = _pending(
        spark,
        [(f"http://x.somedomain.com/{i}", "somedomain.com", i) for i in range(5)]
        + [(f"http://y.fast.com/{i}", "fast.com", i) for i in range(25)],
    )
    st = _state(spark, [("somedomain.com", 0, 0), ("fast.com", 0, 0)])
    s, _ = politeness.schedule_wave(pend, st, _robots(spark), cfg, 0)
    per = {r["tpd"]: r["cnt"] for r in s.groupBy("tpd").agg(F.count("*").alias("cnt")).collect()}
    # fast.com: 1000/100 = 10 per wave; somedomain.com: ceil(1000/1337)=1
    assert per == {"fast.com": 10, "somedomain.com": 1}


def test_fifo_order_with_priority_override(spark):
    cfg = CrawlConfig(per_domain_delay_ms=100, wave_ms=500)
    pend = _pending(
        spark, [(f"http://a.example.com/{i}", "example.com", i) for i in range(5)]
    ).withColumn(
        "priority", F.when(F.col("seq") == 3, F.lit(9.0)).otherwise(F.lit(0.0))
    )
    st = _state(spark, [("example.com", 0, 0)])
    s, _ = politeness.schedule_wave(pend, st, _robots(spark), cfg, 0)
    got = [r["url"][-1] for r in s.orderBy("fetch_ms").collect()]
    assert got == ["3", "0", "1", "2", "4"]  # priority first, then FIFO


def test_robots_blocking(spark):
    cfg = CrawlConfig(per_domain_delay_ms=100, wave_ms=1000)
    pend = _pending(
        spark,
        [("http://a.example.com/private/x", "example.com", 0),
         ("http://a.example.com/ok", "example.com", 1)],
    )
    st = _state(spark, [("example.com", 0, 0)])
    robots = _robots(
        spark,
        [("a.example.com", [(False, "/private", False, "^/private")], None, [], 0)],
    )
    s, blocked = politeness.schedule_wave(pend, st, robots, cfg, 0)
    assert [r["url"] for r in s.collect()] == ["http://a.example.com/ok"]
    assert [r["url"] for r in blocked.collect()] == ["http://a.example.com/private/x"]


def test_schedule_timeout_eviction_and_recreate(spark):
    """After `timeout` cumulative empty polls the schedule is cancelled
    (FrontierThrottler.scala:76-82); new requests re-create it."""
    cfg = CrawlConfig(per_domain_delay_ms=100, wave_ms=100,
                      schedule_timeout_empty_polls=3)
    empty_pend = _pending(spark, [])
    st = _state(spark, [("example.com", 0, 0)])
    for w in range(3):
        s, _ = politeness.schedule_wave(empty_pend, st, _robots(spark), cfg, w)
        st = politeness.next_host_state(st, empty_pend, s, cfg, w)
    assert st.count() == 0  # evicted after 3 empty polls
    # re-created on next pending rows: initial delay = one interval
    pend = _pending(spark, [("http://a.example.com/1", "example.com", 0)])
    s, _ = politeness.schedule_wave(pend, st, _robots(spark), cfg, 7)
    assert s.count() == 0  # first tick one interval later
    st = politeness.next_host_state(st, pend, s, cfg, 7)
    row = st.collect()[0]
    assert row["next_allowed_ms"] == 7 * 100 + 100 and row["empty_waves"] == 0
    s, _ = politeness.schedule_wave(pend, st, _robots(spark), cfg, 8)
    assert s.count() == 1


def test_mega_host_salted_topk_lossless(spark):
    """Skew: 10k pending rows on one host — scheduler emits the exact
    FIFO head regardless of the salted prune."""
    cfg = CrawlConfig(per_domain_delay_ms=10, wave_ms=100, skew_salt_buckets=8)
    pend = _pending(
        spark,
        [(f"http://mega.example.com/{i}", "example.com", i) for i in range(10_000)],
    )
    st = _state(spark, [("example.com", 0, 0)])
    s, _ = politeness.schedule_wave(pend, st, _robots(spark), cfg, 0)
    got = [int(r["url"].rsplit("/", 1)[1]) for r in s.orderBy("fetch_ms").collect()]
    assert got == list(range(10))  # exact first 10, in order


def test_crawl_delay_stricter_and_capped(spark):
    """robots Crawl-delay: per TPD the interval becomes the stricter of
    the configured delay and the max declared delay among the TPD's
    hosts (capped at robots_max_delay_ms); hosts with no declared delay
    are unaffected (F.least null-skip regression)."""
    cfg = CrawlConfig(per_domain_delay_ms=100, wave_ms=1000, robots_max_delay_ms=60_000)
    pend = _pending(
        spark,
        [(f"http://a.example.com/{i}", "example.com", i) for i in range(20)]
        + [(f"http://b.other.com/{i}", "other.com", i) for i in range(20)]
        + [(f"http://c.parked.com/{i}", "parked.com", i) for i in range(20)],
    )
    st = _state(
        spark, [("example.com", 0, 0), ("other.com", 0, 0), ("parked.com", 0, 0)]
    )
    robots = _robots(
        spark,
        [
            ("a.example.com", [], 500, [], 0),       # declared 0.5 s
            ("c.parked.com", [], 86_400_000, [], 0), # hostile: one day
        ],
    )
    s, _ = politeness.schedule_wave(pend, st, robots, cfg, 0)
    per = {
        r["tpd"]: r["cnt"]
        for r in s.groupBy("tpd").agg(F.count("*").alias("cnt")).collect()
    }
    # example.com: ceil(1000/500)=2; other.com: no Crawl-delay → 10;
    # parked.com: capped at 60 s → still schedules 1 this wave
    assert per == {"example.com": 2, "other.com": 10, "parked.com": 1}
    # disabled honor flag → config delay everywhere
    cfg_off = CrawlConfig(per_domain_delay_ms=100, wave_ms=1000, honor_crawl_delay=False)
    s_off, _ = politeness.schedule_wave(pend, st, robots, cfg_off, 0)
    assert s_off.count() == 30


def test_crawl_delay_parse_jvm_twin_parity(spark):
    """parse_crawl_delay_expr ≡ py_parse_crawl_delay: group selection,
    fractional seconds (ceil to ms), max-merge within the winning
    specificity, unparseable values skipped, absent → null."""
    from crawler import robots as robots_mod

    texts = [
        # specific group wins over *
        "User-agent: *\nCrawl-delay: 9\nUser-agent: sparkcrawler\nCrawl-delay: 2",
        # fractional seconds ceil to ms
        "User-agent: *\nCrawl-delay: 0.5",
        "User-agent: *\nCrawl-delay: 1.2345",
        # max of multiple declarations at winning specificity
        "User-agent: sparkcrawler\nCrawl-delay: 1\nUser-agent: sparkcrawler\nCrawl-delay: 7",
        # unparseable → skipped; none parseable → null
        "User-agent: *\nCrawl-delay: soon",
        "User-agent: *\nDisallow: /x",
        # delay in a non-matching group is ignored
        "User-agent: otherbot\nCrawl-delay: 30",
        # headerless implicit * group
        "Crawl-delay: 3",
        # overflow clamp
        "User-agent: *\nCrawl-delay: 99999999999",
    ]
    expect = [2000, 500, 1235, 7000, None, None, None, 3000, 2**31 - 1]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r["cd"]
        for r in df.select(
            robots_mod.parse_crawl_delay_expr(F.col("t"), "sparkcrawler").alias("cd")
        ).collect()
    ]
    assert got == expect
    assert [
        robots_mod.py_parse_crawl_delay(t, "sparkcrawler") for t in texts
    ] == expect


def test_warm_cache_crawl_delay_engine_oracle_parity(spark, wh_root):
    """ADVICE r3: a PRE-SEEDED robots cache carrying a Crawl-delay with
    fetch_robots=False must schedule identically engine-side (which
    gates on cache presence, not fetch_robots) and oracle-side (which
    now accepts constructor crawl-delay values)."""
    import pandas as pd

    from crawler import synth as s
    from crawler.loop import Crawl
    from crawler.oracle import Oracle

    fan = "".join(f'<a href="/q/{i}">x</a>' for i in range(8))
    pages = [s._page("http://slow.com/p/0", 200, None, "doc:p0")]
    docs = [s._doc("doc:p0", fan)]
    for i in range(8):
        pages.append(s._page(f"http://slow.com/q/{i}", 200, None, f"doc:q{i}"))
        docs.append(s._doc(f"doc:q{i}", "leaf"))
    pages_pd, docs_pd = pd.DataFrame(pages), pd.DataFrame(docs)

    cfg = CrawlConfig(
        per_domain_delay_ms=100, wave_ms=1000, seed_url_seen=True,
        max_waves=10, bloom_shards=8, fetch_robots=False,
        honor_crawl_delay=True,
    )
    # warm cache: allow-all rules, declared Crawl-delay 500ms
    warm = spark.createDataFrame(
        [("slow.com", [], 500, [], 0)], schemas.ROBOTS_CACHE
    )
    seeds = ["http://slow.com/p/0"]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, s.pages_df(spark, pages_pd), s.documents_df(spark, docs_pd),
           robots=warm)
    c.run()
    o = Oracle(
        pages_pd, docs_pd, cfg,
        robots={"slow.com": []},
        robots_crawl_delay={"slow.com": 500},
    ).run(seeds)

    rows = (
        c._read("fetched")
        .select("wave", "fetch_ms", "url")
        .orderBy("wave", "fetch_ms", "url")
        .collect()
    )
    got = [(r["wave"], r["fetch_ms"], r["url"]) for r in rows]
    assert got == o.order_per_host.get("slow.com", [])
    # the declared 500ms (not the 100ms config) is the interval: at most
    # wave_ms/500 = 2 fetches per wave on both sides
    per_wave: dict[int, int] = {}
    for w, _, _ in got:
        per_wave[w] = per_wave.get(w, 0) + 1
    assert got and max(per_wave.values()) <= 2
