"""Sitemap ingestion (config.ingest_sitemaps) — robots-declared Sitemap
URLs enter the frontier through the link-admission path, and fetched
sitemap documents (<urlset>/<sitemapindex>) yield their <loc> entries
as links.

North-rule seed-discovery extension (the reference has no sitemap
handling — off = parity).  Builds on the round-3 robots Sitemap
extraction (robots.parse_sitemaps_expr): the cached `sitemaps` column
stops being a passive surface and actually drives discovery.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawler import extract, synth
from crawler.config import CrawlConfig
from crawler.config import test_config as make_test_config
from crawler.loop import Crawl
from crawler.oracle import Oracle
from crawler.synth import _doc, _page
from tests.test_e2e_crawl import _assert_equivalent

HOST = "smhost.example.com"
ROOT = f"http://{HOST}/"

SITEMAP_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    f"  <url><loc>http://{HOST}/p1</loc></url>\n"
    # inner whitespace trimmed + &amp; decoded
    f"  <url><loc>\n    http://{HOST}/p2?a=1&amp;b=2\n  </loc></url>\n"
    # relative loc → dropped (protocol requires full URLs)
    "  <url><loc>relative/not-absolute</loc></url>\n"
    # uppercase tag + space before > both match
    f"  <url><LOC >http://{HOST}/p3</LOC ></url>\n"
    "</urlset>\n"
)


def _fixture():
    pages, docs = [], []

    def add(url, body=None, status=200, location=None):
        doc_id = None
        if body is not None and status == 200:
            doc_id = f"doc:{url}"
            docs.append(_doc(doc_id, body))
        pages.append(_page(url, status, location, doc_id))

    # root links NOTHING — every discovery beyond the seed is sitemap-driven
    add(ROOT, "<p>hello root</p>")
    add(
        f"http://{HOST}/robots.txt",
        "User-agent: *\nAllow: /\n"
        f"Sitemap: http://{HOST}/sitemap.xml\n"
        # cross-host declaration: admitted (same_tpd_only off), fetch
        # fails with status 0 (unknown host) on both sides
        "Sitemap: http://other.example.org/sm.xml\n",
    )
    add(f"http://{HOST}/sitemap.xml", SITEMAP_XML)
    add(f"http://{HOST}/p1", '<a href="/linked">deep</a>')
    add(f"http://{HOST}/p2?a=1&b=2", "<p>two</p>")
    add(f"http://{HOST}/p3", "<p>three</p>")
    add(f"http://{HOST}/linked", "<p>via p1 href</p>")
    return pd.DataFrame(pages), pd.DataFrame(docs)


def _run_both(spark, wh_root, cfg):
    pages_pd, docs_pd = _fixture()
    c = Crawl(spark, wh_root, cfg)
    c.init([ROOT], synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd))
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run([ROOT])
    _assert_equivalent(spark, c, o)
    return c, o


def test_sitemap_ingest_discovers_pages(spark, wh_root):
    cfg = make_test_config(fetch_robots=True, ingest_sitemaps=True, max_waves=10)
    c, o = _run_both(spark, wh_root, cfg)
    # discovery actually happened: sitemap.xml itself, its valid <loc>
    # entries, the cross-host sitemap, and the href found on p1
    for u in (
        f"http://{HOST}/sitemap.xml",
        f"http://{HOST}/p1",
        f"http://{HOST}/p2?a=1&b=2",
        f"http://{HOST}/p3",
        "http://other.example.org/sm.xml",
        f"http://{HOST}/linked",
    ):
        assert u in o.url_seen, u
    # the relative <loc> was dropped
    assert not any("relative" in u for u in o.url_seen)
    # fetched pages delivered (cross-host sm.xml fails with status 0)
    assert f"http://{HOST}/p2?a=1&b=2" in o.fetched_spans
    assert "http://other.example.org/sm.xml" not in o.fetched_spans


def test_sitemaps_inert_by_default(spark, wh_root):
    # parity: without ingest_sitemaps the cached sitemaps column stays a
    # passive surface — nothing beyond the (link-free) seed is crawled
    cfg = make_test_config(fetch_robots=True, max_waves=6)
    c, o = _run_both(spark, wh_root, cfg)
    assert f"http://{HOST}/p1" not in o.url_seen
    assert f"http://{HOST}/sitemap.xml" not in o.url_seen
    assert len(o.url_seen) == 1  # just the seed canon


def test_loc_expr_twin_parity(spark):
    cases = [
        SITEMAP_XML,
        "",
        "<loc>http://a.com/x</loc>",  # no urlset gate here — expr level
        "<LOC>HTTP://UPPER.com/</LOC>",
        "<loc>http://a.com/?q=&amp;x=&lt;1&gt;&quot;&apos;</loc>",
        "<loc>ftp://files.example.com/f</loc>",  # non-http scheme still absolute
        "<loc>not a url</loc><loc></loc><loc>  </loc>",
        "<loc>http://multi\nline.example.com</loc>",  # dot-matches-newline
        "unterminated <loc>http://a.com/tail",  # no close tag → no match
    ]
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = [
        r["locs"]
        for r in df.select(
            extract.sitemap_locs_expr(df["text"]).alias("locs")
        ).collect()
    ]
    want = [extract.py_find_locs(t) for t in cases]
    assert got == want
    # and the planted expectations themselves
    assert want[0] == [
        f"http://{HOST}/p1",
        f"http://{HOST}/p2?a=1&b=2",
        f"http://{HOST}/p3",
    ]
    assert want[4] == ['http://a.com/?q=&x=<1>"\'']
    assert want[8] == []


def test_ingest_requires_fetch_robots():
    with pytest.raises(ValueError, match="ingest_sitemaps"):
        CrawlConfig(ingest_sitemaps=True)


def test_py_extract_links_loc_gate():
    spans = [
        {"kind": "text", "text": "<urlset>", "offset": 0},
        {
            "kind": "text",
            "text": f'<a href="http://{HOST}/a">x</a><loc>http://{HOST}/b</loc>',
            "offset": 1,
        },
    ]
    # flag off → hrefs only
    out = extract.py_extract_links(ROOT, spans, None)
    assert [d for d, k, _ in out] == [f"http://{HOST}/a"]
    # flag on → loc too, ordered after the same span's hrefs
    out = extract.py_extract_links(ROOT, spans, None, parse_sitemap_locs=True)
    assert [(d, k) for d, k, _ in out] == [
        (f"http://{HOST}/a", "content"),
        (f"http://{HOST}/b", "sitemap_loc"),
    ]
    assert out[0][2] < out[1][2]
    # no <urlset/<sitemapindex anywhere → loc ignored even with the flag
    out = extract.py_extract_links(
        ROOT, [spans[1]], None, parse_sitemap_locs=True
    )
    assert [d for d, k, _ in out] == [f"http://{HOST}/a"]
