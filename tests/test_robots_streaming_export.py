"""robots.txt caching, streaming seed intake, ES bulk export."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from crawler import export, robots, synth
from crawler.config import CrawlConfig
from crawler.loop import Crawl
from crawler.oracle import Oracle


def _jvm_rules(spark, text: str, ua: str):
    df = spark.createDataFrame([(text,)], "t string")
    rows = df.select(
        robots.parse_rules_expr(F.col("t"), ua).alias("r")
    ).collect()[0]["r"]
    return [(r["allow"], r["pattern"], r["wild"], r["re"]) for r in rows]


def _jvm_blocked(spark, text: str, ua: str, url: str) -> bool:
    df = spark.createDataFrame([(text, url)], "t string, url string")
    return df.select(
        robots.blocked_expr(
            robots.parse_rules_expr(F.col("t"), ua),
            robots.match_target_expr("url"),
        ).alias("b")
    ).collect()[0]["b"]


ROBOTS_GROUPS = """\
# global rules
User-agent: *
Disallow: /private
Disallow: /tmp/x \r
Allow: /ok
Disallow:

User-agent: sparkcrawler
User-agent: otherbot
Disallow: /only-spark
Allow: /only-spark/pub
"""


def test_parse_rules_group_selection(spark):
    """The most specific matching UA group wins; JVM ≡ scalar twin;
    empty Disallow is a no-op line; comments and CRLF are stripped."""
    # our UA matches the sparkcrawler group → only its rules
    got = _jvm_rules(spark, ROBOTS_GROUPS, "sparkcrawler")
    py = robots.py_parse_rules(ROBOTS_GROUPS, "sparkcrawler")
    assert [(a, p, w) for a, p, w, _ in got] == [
        (False, "/only-spark", False),
        (True, "/only-spark/pub", False),
    ]
    assert got == py
    # an unknown UA falls back to the * group
    got_star = _jvm_rules(spark, ROBOTS_GROUPS, "nobody")
    assert [(a, p) for a, p, _, _ in got_star] == [
        (False, "/private"), (False, "/tmp/x"), (True, "/ok"),
    ]
    assert got_star == robots.py_parse_rules(ROBOTS_GROUPS, "nobody")


def test_parse_rules_leniency_and_empty_group(spark):
    # headerless leading rules belong to an implicit * group
    bare = "Disallow: /x"
    assert _jvm_rules(spark, bare, "anybot") == robots.py_parse_rules(
        bare, "anybot"
    ) == [(False, "/x", False, "^/x")]
    # blank lines are insignificant (RFC 9309): UA lines separated only
    # by blanks still form ONE group's user-agent list
    merged = "User-agent: sparkcrawler\n\nUser-agent: *\nDisallow: /"
    assert [(a, p) for a, p, _, _ in _jvm_rules(spark, merged, "sparkcrawler")] == [
        (False, "/")
    ]
    # a matching specific group with NO rules means allow-all — the *
    # group's rules are NOT consulted (RFC 9309 group selection); a
    # non-rule directive (Sitemap) ends the UA run, separating groups
    empty_specific = (
        "User-agent: sparkcrawler\nSitemap: http://h.com/s.xml\n"
        "User-agent: *\nDisallow: /"
    )
    assert _jvm_rules(spark, empty_specific, "sparkcrawler") == []
    assert robots.py_parse_rules(empty_specific, "sparkcrawler") == []
    assert not _jvm_blocked(spark, empty_specific, "sparkcrawler", "http://h.com/a")


def test_rules_longest_match_precedence(spark):
    """Longest matched pattern wins; on a length tie Allow wins."""
    txt = "User-agent: *\nDisallow: /a\nAllow: /a/pub\nDisallow: /a/pub/secret"
    cases = [
        ("http://h.com/a/x", True),            # /a
        ("http://h.com/a/pub/ok", False),      # /a/pub outranks /a
        ("http://h.com/a/pub/secret/f", True), # longest again
        ("http://h.com/b", False),             # no rule matches
    ]
    for url, want in cases:
        assert _jvm_blocked(spark, txt, "bot", url) is want, url
        assert robots.py_blocked(
            robots.py_parse_rules(txt, "bot"), robots.py_match_target(url)
        ) is want, url
    # exact length tie → allow wins
    tie = "User-agent: *\nDisallow: /ab\nAllow: /ab"
    assert _jvm_blocked(spark, tie, "bot", "http://h.com/ab/x") is False


def test_rules_wildcards_and_anchor(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /cgi/*?sid=\n"
        "Disallow: /exact$\n"
    )
    cases = [
        ("http://h.com/docs/a.pdf", True),       # $-anchored suffix
        ("http://h.com/docs/a.pdfx", False),     # anchor holds
        ("http://h.com/cgi/run?sid=1", True),    # * + query matching
        ("http://h.com/cgi/run?id=1", False),
        ("http://h.com/exact", True),
        ("http://h.com/exact/sub", False),
    ]
    for url, want in cases:
        assert _jvm_blocked(spark, txt, "bot", url) is want, url
        assert robots.py_blocked(
            robots.py_parse_rules(txt, "bot"), robots.py_match_target(url)
        ) is want, url
    # bare-host URL: 'Disallow: /' blocks it (path '' → '/')
    assert _jvm_blocked(spark, "Disallow: /", "bot", "http://h.com") is True


def test_match_target_bare_query_twin_parity(spark):
    """A trailing '?' with an EMPTY query: java parse_url returns ''
    (non-null) so the engine target keeps the '?'; the scalar twin must
    agree (urlsplit collapses '?'-present and '?'-absent to query='')."""
    urls = [
        "http://h.com/p?",      # bare '?'
        "http://h.com/p",       # no query at all
        "http://h.com/?",       # root with bare '?'
        "http://h.com/p?a=1",   # real query
        "http://h.com/p#x?y",   # '?' only in the fragment → not a query
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    jvm = [
        r["t"]
        for r in df.select(robots.match_target_expr("url").alias("t")).collect()
    ]
    assert jvm == [robots.py_match_target(u) for u in urls]
    assert jvm == ["/p?", "/p", "/?", "/p?a=1", "/p"]
    # and the verdict edge cases: '/*?'-style and '$'-anchored rules split
    # exactly on the presence of the bare '?'
    txt = "User-agent: *\nDisallow: /*?\nAllow: /p$"
    for url, want in [("http://h.com/p?", True), ("http://h.com/p", False)]:
        assert _jvm_blocked(spark, txt, "bot", url) is want, url
        assert robots.py_blocked(
            robots.py_parse_rules(txt, "bot"), robots.py_match_target(url)
        ) is want, url


def test_robots_crawl_equivalence(spark, wh_root):
    """fetch_robots on: mega.com's /p/1 prefix is never fetched; engine ≡
    oracle under in-crawl robots fetching."""
    cfg = CrawlConfig(
        per_domain_delay_ms=100, wave_ms=300, seed_url_seen=True,
        max_waves=20, bloom_shards=16, fetch_robots=True,
    )
    pages_pd, docs_pd = synth.multihost_fixture(
        n_hosts=8, pages_per_host=5, mega_host_pages=30
    )
    pages, docs = synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd)
    seeds = ["http://mega.com/p/0", "http://h001.com/p/0"]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, pages, docs)
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)

    fetched_urls = [r["url"] for r in c._read("fetched").select("url").collect()]
    assert all(not u.startswith("http://mega.com/p/1") for u in fetched_urls)
    assert all(not u.startswith("http://h001.com/p/3") for u in fetched_urls)
    # cache table has one row per touched host (incl. negative entries)
    cache = {
        r["host"]: [(x["allow"], x["pattern"]) for x in r["rules"]]
        for r in c._read("robots_cache").collect()
    }
    assert cache["mega.com"] == [(False, "/p/1")]
    assert cache.get("h000.com") == []  # negative cache

    got = {}
    for r in (
        c._read("fetched").select("host", "wave", "fetch_ms", "url")
        .orderBy("host", "wave", "fetch_ms", "url").collect()
    ):
        got.setdefault(r["host"], []).append((r["wave"], r["fetch_ms"], r["url"]))
    for h in set(got) | set(o.order_per_host):
        assert got.get(h, []) == o.order_per_host.get(h, []), f"host {h}"


def test_streaming_seed_intake(spark, wh_root, tmp_path):
    """S2 analog: readStream file source → foreachBatch frontier merge."""
    from crawler import schemas, streaming
    from crawler.config import test_config

    cfg = test_config(max_waves=3)
    pages_pd, docs_pd = synth.test_server_fixture()
    c = Crawl(spark, wh_root, cfg)
    c.init([], synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd))

    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "batch1.json", "w") as f:
        for i in (1, 2):
            f.write(json.dumps({"url": f"http://localhost:9090/{i}"}) + "\n")
    with open(drop / "batch2.json", "w") as f:
        f.write(json.dumps({"url": "http://localhost:9090/3", "priority": 2.0}) + "\n")

    streaming.run_intake(
        spark, wh_root, str(drop), str(tmp_path / "ckpt"), cfg, once=True
    )
    pend = c.wh.read_committed(spark, "frontier_adds", schemas.FRONTIER)
    urls = sorted(r["url"] for r in pend.collect())
    assert urls == [f"http://localhost:9090/{i}" for i in (1, 2, 3)]
    # priority flowed through
    assert pend.where("priority = 2.0").count() == 1
    # exactly-once: draining the same directory again adds nothing
    streaming.run_intake(
        spark, wh_root, str(drop), str(tmp_path / "ckpt"), cfg, once=True
    )
    assert c.wh.read_committed(spark, "frontier_adds", schemas.FRONTIER).count() == 3


def test_es_bulk_export_shape(spark):
    """ESJsonTransformationsSpec golden shape (field names, header pair
    encoding, entity wrapping, null pruning, bulk action routing) — the
    full ESJsonTransformations.scala:29-40 field set."""
    schema = (
        "url string, tpd string, fetch_ms long, method string, status int,"
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
        "provenance array<string>,"
        "req_headers array<struct<name:string,value:string>>, req_entity binary,"
        "response_headers array<struct<name:string,value:string>>"
    )
    rows = [
        (
            "http://blikk.co/test", "blikk.co", 1500, "POST", 200,
            [{"kind": "text", "text": "OK!", "media_ref": "", "offset": 0}],
            [],
            [{"name": "Accept", "value": "*/*"}], b"post-body",
            # lower-case content-type: derivation is case-insensitive
            [{"name": "content-type", "value": "application/json"}],
        ),
        (
            "http://blikk.co/empty", "blikk.co", 3000, "GET", 200,
            None, ["http://a/b"], [], None, [],
        ),
    ]
    df = spark.createDataFrame(rows, schema)
    out = export.es_bulk_lines(df, "someApp").collect()
    by_url = {}
    for r in out:
        action, doc = r["bulk"].strip().split("\n")
        a = json.loads(action)
        d = json.loads(doc)
        by_url[a["index"]["_id"]] = (a, d, r["tpd"])

    a, d, tpd = by_url["http://blikk.co/test"]
    assert a["index"]["_index"] == "someApp"
    assert a["index"]["_type"] == "fetch_response"
    assert tpd == "blikk.co"
    assert d["request_uri"] == "http://blikk.co/test"
    assert d["request_method"] == "POST"  # verb flows through, not hardcoded
    # headers serialize as [name, value] pairs (spray-json tuple shape)
    assert d["request_headers"] == [["Accept", "*/*"]]
    assert d["response_headers"] == [["content-type", "application/json"]]
    assert d["request_provenance"] == []
    assert d["response_status"] == 200
    # content type derived from the response headers, case-insensitive
    assert d["response_content_type"] == "application/json"
    assert d["response_entity"]["_content_type"] == "application/json"
    assert d["timestamp"] == 1500
    import base64

    assert base64.b64decode(d["request_entity"]["_content"]) == b"post-body"
    assert "_content_type" not in d["request_entity"]
    assert base64.b64decode(d["response_entity"]["_content"]).decode().startswith(
        "text\x1fOK!"
    )
    # null pruning: no spans / empty entity → keys absent entirely
    _, d2, _ = by_url["http://blikk.co/empty"]
    assert "response_entity" not in d2 and "response_content_type" not in d2
    assert "request_entity" not in d2
    assert d2["response_headers"] == []
    assert d2["request_provenance"] == ["http://a/b"]


def test_intake_batch_replay_is_noop(spark, wh_root):
    """Crash-replay idempotence: applying the same micro-batch id twice
    appends once (the catalog records intake_last_batch)."""
    from crawler import schemas, streaming
    from crawler.config import test_config
    from crawler.warehouse import Warehouse

    cfg = test_config(max_waves=3)
    pages_pd, docs_pd = synth.test_server_fixture()
    c = Crawl(spark, wh_root, cfg)
    c.init([], synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd))

    wh = Warehouse(wh_root)
    batch = spark.createDataFrame(
        [("http://localhost:9090/7", None, None, None)], streaming.SEED_DROP_SCHEMA
    )
    assert streaming.apply_intake_batch(wh, batch, 0, cfg) is True
    assert streaming.apply_intake_batch(wh, batch, 0, cfg) is False  # replay
    n = wh.read_committed(spark, "frontier_adds", schemas.FRONTIER).count()
    assert n == 1
    # a later batch still applies
    batch2 = spark.createDataFrame(
        [("http://localhost:9090/8", None, None, None)], streaming.SEED_DROP_SCHEMA
    )
    assert streaming.apply_intake_batch(wh, batch2, 1, cfg) is True
    assert wh.read_committed(spark, "frontier_adds", schemas.FRONTIER).count() == 2


def test_bloom_incremental_commit(spark, wh_root):
    """Unchanged bloom shards' data files carry forward BY PATH across a
    wave (incremental keyed commit, not a full-table rewrite)."""
    from crawler.config import test_config

    cfg = test_config(seed_url_seen=True, max_waves=3, bloom_shards=64)
    pages_pd, docs_pd = synth.test_server_fixture()
    c = Crawl(spark, wh_root, cfg)
    c.init(["http://localhost:9090/crawl/1"],
           synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd))
    t = c._t("url_seen_bloom")
    v0 = c.wh.catalog.version_of("url_seen_bloom")
    files0 = set(t.files(v0))
    c.run_wave(0)
    c.run_wave(1)
    v2 = c.wh.catalog.version_of("url_seen_bloom")
    files2 = set(t.files(v2))
    assert v2 != v0
    # the crawl touches one TPD → at most a few shards change; the rest
    # of the init files must still be referenced verbatim
    carried = files0 & files2
    assert carried, "unchanged shard files must carry forward by reference"
    # table still holds every shard exactly once
    from pyspark.sql import functions as F
    from crawler import schemas
    shards = c.wh.read_committed(spark, "url_seen_bloom", schemas.URL_SEEN_BLOOM)
    per = shards.groupBy("shard_id").count().where("count > 1").count()
    assert per == 0 and shards.count() == cfg.bloom_shards


def test_streaming_stateful_throttler(spark, tmp_path):
    """RabbitThrottler as applyInPandasWithState: one dequeue per
    interval per TPD with state carried ACROSS micro-batches (spacing
    holds between batches, not just within one)."""
    from crawler import streaming
    from crawler.config import CrawlConfig

    cfg = CrawlConfig(per_domain_delay_ms=100, domain_delays={"slow.com": 250})
    drop = tmp_path / "reqs"
    drop.mkdir()
    # batch 1: three a.com requests + one slow.com, submitted at t=0
    with open(drop / "b1.json", "w") as f:
        for i in range(3):
            f.write(json.dumps({"url": f"http://a.com/{i}", "tpd": "a.com",
                                "priority": 0.0, "seq": i, "submit_ms": 0}) + "\n")
        f.write(json.dumps({"url": "http://slow.com/0", "tpd": "slow.com",
                            "priority": 0.0, "seq": 0, "submit_ms": 0}) + "\n")
    # batch 2: two more a.com requests submitted at t=150
    with open(drop / "b2.json", "w") as f:
        for i in (3, 4):
            f.write(json.dumps({"url": f"http://a.com/{i}", "tpd": "a.com",
                                "priority": 0.0, "seq": i, "submit_ms": 150}) + "\n")

    stream = (
        spark.readStream.schema(streaming.THROTTLE_IN)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .json(str(drop))
    )
    out = streaming.throttle_requests_stream(stream, cfg)
    q = (
        out.writeStream.format("memory").queryName("throttled")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["url"]: r["fetch_ms"] for r in spark.sql(
        "SELECT url, fetch_ms FROM throttled").collect()}
    # fresh schedule: first tick one interval after creation, then spaced
    assert [rows[f"http://a.com/{i}"] for i in range(3)] == [100, 200, 300]
    # state carried across micro-batches: batch 2 rows continue the
    # progression (max(clock=400, submit=150) → 400, 500)
    assert [rows[f"http://a.com/{i}"] for i in (3, 4)] == [400, 500]
    # custom per-domain interval honored independently
    assert rows["http://slow.com/0"] == 250


def test_crawl_stats_windowed_watermark(spark, tmp_path):
    """StatsCollector as a streaming windowed agg: tumbling event-time
    windows close once the watermark passes, their aggregates emit in
    append mode, and a row arriving beyond the watermark is dropped
    (bounded state — the 10^10-scale requirement)."""
    from crawler import streaming

    drop = tmp_path / "fetched"
    drop.mkdir()
    # batch 1: two 200s in [10s,20s), one 404 in [20s,30s), plus a
    # watermark driver at 200s (watermark 30s → closes windows < 170s)
    with open(drop / "b1.json", "w") as f:
        for ms, status, nb in (
            (10_000, 200, 100),
            (15_000, 200, 50),
            (25_000, 404, 10),
            (200_000, 200, 1),
        ):
            f.write(json.dumps({"fetch_ms": ms, "status": status, "n_bytes": nb}) + "\n")
    stream = spark.readStream.schema("fetch_ms long, status int, n_bytes long").json(
        str(drop)
    )
    out = streaming.crawl_stats_windowed(stream, window_s=10, watermark_s=30)
    q = (
        out.writeStream.format("memory").queryName("winstats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ws"))
        .start()
    )
    q.processAllAvailable()  # batch 1 → watermark advances to 170s
    # batch 2: one row far behind the watermark (dropped), one current
    with open(drop / "b2.json", "w") as f:
        f.write(json.dumps({"fetch_ms": 12_000, "status": 200, "n_bytes": 999}) + "\n")
        f.write(json.dumps({"fetch_ms": 205_000, "status": 200, "n_bytes": 2}) + "\n")
    q.processAllAvailable()  # closed windows emit; late row dropped
    q.stop()
    q.awaitTermination()
    rows = {
        (int(r["win_start"].timestamp()), r["status"]): (
            r["urls_fetched"],
            r["bytes_fetched"],
        )
        for r in spark.sql("SELECT * FROM winstats").collect()
    }
    # exactly the two closed windows; the late 999-byte row did NOT
    # reopen/inflate [10s,20s), and the open [200s,210s) window is absent
    assert rows == {(10, 200): (2, 150), (20, 404): (1, 10)}


def test_ua_product_token_prefix_matching(spark):
    """UA-group matching is prefix-of-PRODUCT-TOKEN, not substring-of-UA:
    a group written for a different bot whose name happens to occur
    inside ours must not capture us, while the documented layered
    matching ('googlebot' applies to 'googlebot-news') works."""
    ua = "sparkcrawler/1.0 (+https://example.org/bot)"
    txt = "User-agent: crawler\nDisallow: /other\n\nUser-agent: *\nDisallow: /star"
    got = _jvm_rules(spark, txt, ua)
    # 'crawler' is a substring of 'sparkcrawler' but NOT a prefix → '*'
    assert [(a, p) for a, p, _, _ in got] == [(False, "/star")]
    assert got == robots.py_parse_rules(txt, ua)

    txt2 = "User-agent: googlebot\nDisallow: /g\n\nUser-agent: *\nDisallow: /s"
    got2 = _jvm_rules(spark, txt2, "Googlebot-News")
    assert [(a, p) for a, p, _, _ in got2] == [(False, "/g")]
    assert got2 == robots.py_parse_rules(txt2, "Googlebot-News")

    txt3 = (
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: googlebot-news\nDisallow: /n\n\n"
        "User-agent: *\nDisallow: /s"
    )
    got3 = _jvm_rules(spark, txt3, "googlebot-news/2.1")
    assert [(a, p) for a, p, _, _ in got3] == [(False, "/n")]
    assert got3 == robots.py_parse_rules(txt3, "googlebot-news/2.1")


def _span(text):
    return [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]


def test_robots_redirects_and_error_classification(spark):
    """RFC 9309 §2.3.1: a 3xx robots.txt is followed (bounded hops);
    UNREACHABLE (5xx / connection failure) caches complete-disallow;
    4xx and a never-terminating redirect chain cache allow-all.
    Engine (sim join path) ≡ oracle scalar mirror."""
    import pandas as pd

    from crawler import schemas
    from crawler.config import CrawlConfig

    pages_pd = pd.DataFrame(
        [
            # a.com: robots 301 → root-relative /real.txt → 200 with rules
            ("http://a.com/robots.txt", "a.com", 301, "/real.txt", None, None),
            ("http://a.com/real.txt", "a.com", 200, None, "dA", None),
            # b.com: robots 500 → unreachable → complete disallow
            ("http://b.com/robots.txt", "b.com", 500, None, None, None),
            # c.com: redirect loop → budget exhausted → allow-all
            ("http://c.com/robots.txt", "c.com", 302, "http://c.com/r2", None, None),
            ("http://c.com/r2", "c.com", 302, "/robots.txt", None, None),
            # d.com: 404 → unavailable → allow-all
            ("http://d.com/robots.txt", "d.com", 404, None, None, None),
        ],
        columns=["url", "host", "status", "location", "doc_id", "content_type"],
    )
    docs_pd = pd.DataFrame(
        [("dA", _span("User-agent: *\nDisallow: /sec"))],
        columns=["doc_id", "spans"],
    )
    pending = spark.createDataFrame(
        [(f"http://{h}.com/x", f"{h}.com", f"{h}.com") for h in "abcd"],
        "url string, host string, tpd string",
    )
    cache = spark.createDataFrame([], schemas.ROBOTS_CACHE)
    out = robots.refresh_robots(
        pending,
        cache,
        synth.pages_df(spark, pages_pd),
        synth.documents_df(spark, docs_pd),
        wave=0,
        user_agent="bot",
    )
    got = {
        r["host"]: [(x["allow"], x["pattern"]) for x in r["rules"]]
        for r in out.collect()
    }
    assert got == {
        "a.com": [(False, "/sec")],
        "b.com": [(False, "/")],
        "c.com": [],
        "d.com": [],
    }

    # oracle scalar mirror: same classification, same redirect budget
    o = Oracle(pages_pd, docs_pd, CrawlConfig(user_agent="bot"))
    mirror = {
        h: [(a, p) for a, p, _, _ in o._fetch_robots(h, f"http://{h}/x")]
        for h in ("a.com", "b.com", "c.com", "d.com")
    }
    assert mirror == got


def test_sessions_windowed_watermark_and_batch_parity(spark, tmp_path):
    """Streaming sessionization (native session_window): events within
    the gap merge into one session per user, sessions emit once the
    watermark passes their end, a row behind the watermark is dropped
    (bounded state), and the closed sessions equal the same function
    run in BATCH mode over the same rows (stream/batch parity)."""
    from crawler import streaming

    drop = tmp_path / "events"
    drop.mkdir()
    b1 = [
        # user 1: events at 1s and 3s (gap 5s -> one session [1s, 8s))
        {"ts_ms": 1_000, "user_id": 1, "value": 1.0},
        {"ts_ms": 3_000, "user_id": 1, "value": 2.0},
        # user 1: isolated event at 60s -> session [60s, 65s)
        {"ts_ms": 60_000, "user_id": 1, "value": 4.0},
        # user 2: one event; also drives the watermark to 270s
        {"ts_ms": 300_000, "user_id": 2, "value": 8.0},
    ]
    with open(drop / "b1.json", "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")
    schema = "ts_ms long, user_id long, value double"
    stream = spark.readStream.schema(schema).json(str(drop))
    q = (
        streaming.sessions_windowed(stream, gap_s=5, watermark_s=30)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    q.processAllAvailable()
    b2 = [
        {"ts_ms": 2_000, "user_id": 1, "value": 999.0},  # behind watermark
        {"ts_ms": 310_000, "user_id": 2, "value": 16.0},  # keeps u2 open
    ]
    with open(drop / "b2.json", "w") as f:
        for r in b2:
            f.write(json.dumps(r) + "\n")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = {
        (r["user_id"], int(r["sess_start"].timestamp()),
         int(r["sess_end"].timestamp())): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # only user 1's two CLOSED sessions; the late 999 row did not
    # reopen [1s,8s); user 2's session is still open (absent)
    assert got == {(1, 1, 8): (2, 3.0), (1, 60, 65): (1, 4.0)}
    # stream/batch parity: the same function over the same rows in
    # batch mode must agree on every closed session
    batch = streaming.sessions_windowed(
        spark.createDataFrame(
            [(r["ts_ms"], r["user_id"], r["value"]) for r in b1], schema
        ),
        gap_s=5,
    )
    bt = {
        (r["user_id"], int(r["sess_start"].timestamp()),
         int(r["sess_end"].timestamp())): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    for k, v in got.items():
        assert bt[k] == v


def test_dedup_stream_within_watermark_and_horizon(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark): the first
    arrival of each text fingerprint emits once, duplicates within the
    watermark horizon are suppressed (across micro-batches too), and a
    duplicate arriving beyond the horizon re-emits — the documented
    bounded-state contract."""
    from crawler import streaming

    drop = tmp_path / "docs"
    drop.mkdir()
    b1 = [
        {"ts_ms": 1_000, "doc_id": 1, "text": "alpha beta"},
        {"ts_ms": 2_000, "doc_id": 2, "text": "gamma"},
        {"ts_ms": 3_000, "doc_id": 3, "text": "alpha beta"},  # in-batch dup
    ]
    with open(drop / "b1.json", "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")
    schema = "ts_ms long, doc_id long, text string"
    stream = spark.readStream.schema(schema).json(str(drop))
    q = (
        streaming.dedup_stream(stream, watermark_s=30)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    q.processAllAvailable()
    # cross-batch dup still within the horizon is suppressed; a fresh
    # doc advances the watermark far past fingerprint state expiry
    b2 = [
        {"ts_ms": 4_000, "doc_id": 4, "text": "alpha beta"},
        {"ts_ms": 600_000, "doc_id": 5, "text": "delta"},
    ]
    with open(drop / "b2.json", "w") as f:
        for r in b2:
            f.write(json.dumps(r) + "\n")
    q.processAllAvailable()
    # beyond the horizon: the same text re-emits (state was evicted)
    b3 = [{"ts_ms": 599_000, "doc_id": 6, "text": "alpha beta"}]
    with open(drop / "b3.json", "w") as f:
        for r in b3:
            f.write(json.dumps(r) + "\n")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()
    )
    assert got == [1, 2, 5, 6]  # 3 and 4 suppressed; 6 re-emitted


def test_sitemap_extraction_jvm_twin_parity(spark):
    """parse_sitemaps_expr ≡ py_parse_sitemaps: global (group-
    independent) lines, file order kept, non-absolute values dropped,
    URLs with colons survive the kv split."""
    texts = [
        # inside and outside UA groups — both collected, in order
        "Sitemap: https://a.com/s1.xml\nUser-agent: *\nDisallow: /x\n"
        "Sitemap: http://a.com/s2.xml.gz",
        # relative / schemeless → dropped (protocol requires full URLs)
        "Sitemap: /local.xml\nSitemap: a.com/s.xml",
        # none declared
        "User-agent: *\nDisallow: /",
        # comments stripped, CRLF tolerated
        "Sitemap: https://b.com/x.xml  # primary\r\nsitemap: HTTPS://B.COM/Y.XML",
    ]
    expect = [
        ["https://a.com/s1.xml", "http://a.com/s2.xml.gz"],
        [],
        [],
        ["https://b.com/x.xml", "HTTPS://B.COM/Y.XML"],
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r["s"]
        for r in df.select(robots.parse_sitemaps_expr(F.col("t")).alias("s")).collect()
    ]
    assert got == expect
    assert [robots.py_parse_sitemaps(t) for t in texts] == expect


def test_sitemaps_cached_from_fetch(spark):
    """The robots cache row carries the declared sitemap URLs (2xx
    parse only; unreachable/4xx hosts cache an empty list)."""
    from crawler import synth
    from crawler.config import CrawlConfig

    body = "User-agent: *\nDisallow: /p/9\nSitemap: http://smap.com/map.xml"
    pages = [synth._page("http://smap.com/robots.txt", 200, None, "doc:r")]
    docs = [
        {
            "doc_id": "doc:r",
            "spans": [{"kind": "text", "text": body, "media_ref": "", "offset": 0}],
        }
    ]
    pages.append(synth._page("http://smap.com/p/0", 200, None, None))
    import pandas as pd

    import crawler.schemas as schemas_mod

    pend = spark.createDataFrame(
        [
            (
                "http://smap.com/p/0", "http://smap.com/p/0", 1, "smap.com",
                "smap.com", "GET", [], None, [], 0.0, 0, 0, 0,
            )
        ],
        schemas_mod.FRONTIER,
    )
    cache = spark.createDataFrame([], schemas_mod.ROBOTS_CACHE)
    out = robots.refresh_robots(
        pend,
        cache,
        synth.pages_df(spark, pd.DataFrame(pages)),
        synth.documents_df(spark, pd.DataFrame(docs)),
        wave=0,
        user_agent="bot",
    ).collect()
    assert len(out) == 1
    assert out[0]["sitemaps"] == ["http://smap.com/map.xml"]
    assert [(r["allow"], r["pattern"]) for r in out[0]["rules"]] == [(False, "/p/9")]
