"""Real-network fetch path (O5): crawler/fetchhttp.py driven against a
LIVE local HTTP server serving the reference test fixture — the same
shape as the reference's integration tests, which crawl a local
TestHttpServer (TestHttpServer.scala:18-44) with the real Spray client.

The headline assertion: a full crawl through the real fetcher produces
the same crawl order, URL-seen set, byte counts, and (normalized) span
streams as the network-free fetchsim join over the identical fixture.
"""

from __future__ import annotations

import gzip
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from crawler import fetchhttp, synth
from crawler.config import test_config as make_config
from crawler.loop import Crawl


#: served by the live server's /robots.txt and mirrored into the sim
#: fixture by _fixture_with_robots — blocks the ring at /crawl/5
ROBOTS_BODY = "User-agent: *\nDisallow: /crawl/5"


def render_body(spans: list[dict]) -> str:
    """Fixture spans → HTML body (the renderer fetchhttp.spans_from_html
    inverts): text spans verbatim, media spans as <img src>."""
    return "".join(
        s["text"] if s["kind"] == "text" else f'<img src="{s["media_ref"]}">'
        for s in spans
    )


@pytest.fixture(scope="module")
def live_server():
    """The TestHttpServer fixture graph on a real localhost socket."""
    pages_pd, docs_pd = synth.test_server_fixture()
    bodies = {
        d["doc_id"]: render_body(d["spans"]) for d in docs_pd.to_dict("records")
    }
    routes = {}
    for p in pages_pd.to_dict("records"):
        path = "/" + p["url"].split("://", 1)[1].split("/", 1)[1] if "/" in p[
            "url"
        ].split("://", 1)[1] else "/"
        routes[path] = p

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/robots.txt":
                body = ROBOTS_BODY.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/gz":  # handler-only route: gzip coding
                raw = gzip.compress(b"<html><body>gz OK</body></html>")
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)
                return
            row = routes.get(self.path)
            if row is None:  # default route (TestHttpServer.scala:45)
                body = b"OK!"
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            status = int(row["status"])
            if status in (301, 302, 303, 307, 308):
                self.send_response(status)
                self.send_header("Location", row["location"])
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if status != 200:
                self.send_response(status)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = bodies.get(row["doc_id"], "OK!").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    yield {"localhost:9090": f"127.0.0.1:{port}"}
    srv.shutdown()


def _scheduled_df(spark, urls: list[str]):
    from crawler import urlnorm

    rows = [
        (
            u,
            u,
            u.split("://")[1].split("/")[0],
            "localhost" if "localhost" in u else u.split("://")[1].split("/")[0],
            0,
            i,
            "GET",
            [u],
            None,
            None,
        )
        for i, u in enumerate(urls)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, url_canon string, host string, tpd string, fetch_ms long,"
        " seq long, method string, provenance array<string>,"
        " req_headers array<struct<name:string,value:string>>, req_entity binary",
    )
    return df


def test_fetch_http_routes(spark, live_server):
    fetch = fetchhttp.http_fetcher(resolve=live_server, timeout_s=5.0)
    base = "http://localhost:9090"
    out = {
        r["url"]: r
        for r in fetch(
            _scheduled_df(
                spark,
                [
                    f"{base}/links/1",
                    f"{base}/status/301",
                    f"{base}/status/404",
                    f"{base}/gz",
                    f"{base}/unknown/path",
                    "http://no-such-host.invalid/x",
                ],
            )
        ).collect()
    }

    ok = out[f"{base}/links/1"]
    assert ok["status"] == 200 and ok["content_type"] == "text/html"
    text = "".join(s["text"] for s in ok["spans"])
    assert '<a href="/links/2">' in text

    redir = out[f"{base}/status/301"]
    assert redir["status"] == 301 and redir["location"] == "/"

    assert out[f"{base}/status/404"]["status"] == 404
    assert out[f"{base}/unknown/path"]["status"] == 200  # default route

    gz = out[f"{base}/gz"]
    assert gz["status"] == 200
    assert "gz OK" in "".join(s["text"] for s in gz["spans"])
    names = [h["name"].lower() for h in gz["response_headers"]]
    assert "content-encoding" not in names  # consumed by the decode

    dead = out["http://no-such-host.invalid/x"]
    assert dead["status"] == 0 and dead["spans"] is None


def test_spans_from_html_roundtrip():
    """renderer ∘ parser is the identity on the normalized span stream,
    for every fixture document (media interleavings included)."""
    _, docs_pd = synth.test_server_fixture()
    for d in docs_pd.to_dict("records"):
        fixture = fetchhttp.normalize_spans(d["spans"])
        reparsed = fetchhttp.normalize_spans(
            fetchhttp.spans_from_html(render_body(d["spans"]))
        )
        assert reparsed == fixture, d["doc_id"]


def test_http_crawl_matches_fetchsim(spark, live_server, tmp_path):
    """Full ring crawl through the REAL fetcher == fetchsim crawl:
    same per-wave fetch set, same fetch_ms (order), same URL-seen,
    same bytes, same normalized span streams for every 200 page."""
    pages_pd, docs_pd = synth.test_server_fixture()
    pages = synth.pages_df(spark, pages_pd)
    docs = synth.documents_df(spark, docs_pd)
    cfg = make_config(seed_url_seen=True, max_waves=14)
    seeds = ["http://localhost:9090/crawl/1"]

    sim = Crawl(spark, str(tmp_path / "wh_sim"), cfg)
    sim.init(seeds, pages, docs)
    sim.run(quiet=True)

    real = Crawl(
        spark,
        str(tmp_path / "wh_http"),
        cfg,
        fetcher=fetchhttp.http_fetcher(resolve=live_server, timeout_s=5.0),
    )
    real.init(seeds, pages, docs)
    real.run(quiet=True)

    def delivered(c):
        return {
            r["url"]: r
            for r in c._read("fetched").where(F.col("status") == 200).collect()
        }

    sim_rows, real_rows = delivered(sim), delivered(real)
    assert sorted(sim_rows) == sorted(real_rows)
    for url, s in sim_rows.items():
        r = real_rows[url]
        assert (s["wave"], s["fetch_ms"], s["seq"]) == (
            r["wave"],
            r["fetch_ms"],
            r["seq"],
        ), url
        assert s["n_bytes"] == r["n_bytes"], url
        s_spans = [row.asDict() for row in s["spans"]]
        r_spans = [row.asDict() for row in r["spans"]]
        assert fetchhttp.normalize_spans(s_spans) == fetchhttp.normalize_spans(
            r_spans
        ), url

    seen = lambda c: {r["url_canon"] for r in c._read("url_seen").collect()}  # noqa: E731
    assert seen(sim) == seen(real)


def test_http_robots_over_the_wire(spark, live_server, tmp_path):
    """With a real fetcher and fetch_robots=True, robots.txt is fetched
    over the actual socket (refresh_robots_via) — and the crawl it
    gates equals the fixture-join sim crawl given the same robots body:
    the ring stops at the Disallow'd /crawl/5 in both."""
    import pandas as pd

    pages_pd, docs_pd = synth.test_server_fixture()
    # mirror the live server's /robots.txt into the sim fixture
    rb_doc = "doc:/robots.txt"
    docs_sim = pd.concat(
        [
            docs_pd,
            pd.DataFrame(
                [
                    {
                        "doc_id": rb_doc,
                        "spans": [
                            {
                                "kind": "text",
                                "text": ROBOTS_BODY,
                                "media_ref": "",
                                "offset": 0,
                            }
                        ],
                    }
                ]
            ),
        ],
        ignore_index=True,
    )
    pages_sim = pd.concat(
        [
            pages_pd,
            pd.DataFrame(
                [
                    {
                        "url": "http://localhost:9090/robots.txt",
                        "host": "localhost",
                        "status": 200,
                        "location": None,
                        "doc_id": rb_doc,
                        "content_type": "text/plain",
                    }
                ]
            ),
        ],
        ignore_index=True,
    )
    cfg = make_config(seed_url_seen=True, max_waves=14, fetch_robots=True)
    seeds = ["http://localhost:9090/crawl/1"]

    sim = Crawl(spark, str(tmp_path / "wh_sim_rb"), cfg)
    sim.init(seeds, synth.pages_df(spark, pages_sim), synth.documents_df(spark, docs_sim))
    sim.run(quiet=True)

    real = Crawl(
        spark,
        str(tmp_path / "wh_http_rb"),
        cfg,
        fetcher=fetchhttp.http_fetcher(resolve=live_server, timeout_s=5.0),
    )
    real.init(
        seeds, synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd)
    )
    real.run(quiet=True)

    def fetched_urls(c):
        return {
            r["url"] for r in c._read("fetched").where(F.col("status") == 200).collect()
        }

    want = {f"http://localhost:9090/crawl/{k}" for k in range(1, 5)}
    assert fetched_urls(sim) == want
    assert fetched_urls(real) == want

    # the wire-fetched rules parse to the same compiled rule set
    from crawler.robots import py_parse_rules

    want_rules = py_parse_rules(ROBOTS_BODY, cfg.user_agent)
    got = {
        r["host"]: [
            (x["allow"], x["pattern"], x["wild"], x["re"]) for x in r["rules"]
        ]
        for r in real._read("robots_cache").collect()
    }
    assert got["localhost"] == want_rules


def test_within_host_wire_order_follows_scheduler_clock(spark):
    """Requests to ONE host go over the wire in the scheduler's
    (fetch_ms, seq) clock order, not DataFrame row order — the pacing
    layer's sequencing claim (crawler/fetchhttp.py run_batches sorts the
    buffered task rows before grouping by host)."""
    seen: list[str] = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen.append(self.path)
            body = b"OK!"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        n = 12
        # row i carries fetch_ms = (n-1-i)*10: row order is the exact
        # REVERSE of the schedule clock
        rows = [
            (
                f"http://localhost:9090/p/{i}",
                f"http://localhost:9090/p/{i}",
                "localhost:9090",
                "localhost",
                (n - 1 - i) * 10,
                i,
                "GET",
                [f"http://localhost:9090/p/{i}"],
                None,
                None,
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows,
            "url string, url_canon string, host string, tpd string,"
            " fetch_ms long, seq long, method string,"
            " provenance array<string>,"
            " req_headers array<struct<name:string,value:string>>,"
            " req_entity binary",
        )
        fetch = fetchhttp.http_fetcher(
            resolve={"localhost:9090": f"127.0.0.1:{srv.server_address[1]}"},
            timeout_s=5.0,
        )
        assert fetch(df).count() == n
        assert seen == [f"/p/{i}" for i in reversed(range(n))]
    finally:
        srv.shutdown()


def test_robots_via_follows_redirect_over_the_wire(spark):
    """A 302 robots.txt is chased to its target through the real
    fetcher; the parsed rules come from the redirect target."""
    from crawler import robots, schemas

    RULES_BODY = "User-agent: *\nDisallow: /x"

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/robots.txt":
                self.send_response(302)
                self.send_header("Location", "/rules.txt")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = RULES_BODY.encode() if self.path == "/rules.txt" else b"OK!"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        pending = spark.createDataFrame(
            [("http://localhost:9090/a", "localhost:9090", "localhost")],
            "url string, host string, tpd string",
        )
        cache = spark.createDataFrame([], schemas.ROBOTS_CACHE)
        fetcher = fetchhttp.http_fetcher(
            resolve={"localhost:9090": f"127.0.0.1:{srv.server_address[1]}"},
            timeout_s=5.0,
        )
        rows = robots.refresh_robots_via(
            pending, cache, 0, "bot", fetcher
        ).collect()
        assert len(rows) == 1 and rows[0]["host"] == "localhost:9090"
        got = [(x["allow"], x["pattern"]) for x in rows[0]["rules"]]
        assert got == [(False, "/x")]
        assert got == [
            (a, p) for a, p, _, _ in robots.py_parse_rules(RULES_BODY, "bot")
        ]
    finally:
        srv.shutdown()


def test_malformed_server_yields_rows_not_task_failure(spark):
    """One broken server must never crash the fetch task: a short body
    (IncompleteRead) keeps its prefix; a garbage status line and an
    immediate close yield status-0 rows; the healthy row is unaffected."""
    import socketserver

    class RawHandler(socketserver.StreamRequestHandler):
        def handle(self):
            line = self.rfile.readline().decode("latin1")
            while True:  # drain request headers
                if self.rfile.readline() in (b"\r\n", b"\n", b""):
                    break
            path = line.split(" ")[1] if " " in line else "/"
            if path == "/short":
                # Content-Length lies: 100 advertised, 10 sent
                self.wfile.write(
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: 100\r\n\r\nhello<a href"
                )
            elif path == "/garbage":
                self.wfile.write(b"TOTALLY NOT HTTP\r\n\r\nwat")
            elif path == "/ok":
                body = b"<p>fine</p>"
                self.wfile.write(
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: %d\r\n\r\n%s" % (len(body), body)
                )
            # '/close' (and everything else): just close the connection

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), RawHandler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = "http://localhost:9090"
        urls = [f"{base}/short", f"{base}/garbage", f"{base}/close", f"{base}/ok"]
        fetch = fetchhttp.http_fetcher(
            resolve={"localhost:9090": f"127.0.0.1:{srv.server_address[1]}"},
            timeout_s=5.0,
        )
        out = {r["url"]: r for r in fetch(_scheduled_df(spark, urls)).collect()}
        assert len(out) == 4  # every request produced a row — no task death
        short = out[f"{base}/short"]
        assert short["status"] == 200  # truncated body keeps its prefix
        assert "hello" in "".join(s["text"] for s in short["spans"])
        assert out[f"{base}/garbage"]["status"] == 0
        assert out[f"{base}/close"]["status"] == 0
        assert out[f"{base}/ok"]["status"] == 200
    finally:
        srv.shutdown()


def test_same_tpd_hosts_sequenced_and_paced(spark):
    """Sibling hosts of ONE registrable domain share the politeness
    clock: their requests are strictly sequential in fetch_ms order
    (never concurrent), and consecutive requests are paced by the
    schedule's fetch_ms gaps."""
    import time as _time

    seen: list[str] = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen.append(self.headers.get("Host", "") + self.path)
            body = b"OK!"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        addr = f"127.0.0.1:{srv.server_address[1]}"
        # alternating sibling hosts, one shared tpd, 150 ms ticks
        hosts = ["a.x.com", "b.x.com", "a.x.com", "b.x.com"]
        rows = [
            (
                f"http://{h}/p/{i}", f"http://{h}/p/{i}", h, "x.com",
                i * 150, i, "GET", [f"http://{h}/p/{i}"], None, None,
            )
            for i, h in enumerate(hosts)
        ]
        df = spark.createDataFrame(
            rows,
            "url string, url_canon string, host string, tpd string,"
            " fetch_ms long, seq long, method string,"
            " provenance array<string>,"
            " req_headers array<struct<name:string,value:string>>,"
            " req_entity binary",
        )
        fetch = fetchhttp.http_fetcher(
            resolve={"a.x.com": addr, "b.x.com": addr}, timeout_s=5.0
        )
        t0 = _time.monotonic()
        assert fetch(df).count() == 4
        elapsed = _time.monotonic() - t0
        # strict fetch_ms sequencing across sibling hosts of the tpd
        assert seen == [f"{h}/p/{i}" for i, h in enumerate(hosts)]
        # paced: three 150 ms gaps must be honored (sleep guarantees a
        # lower bound; upper bound is host-dependent, not asserted)
        assert elapsed >= 0.40, elapsed
    finally:
        srv.shutdown()
