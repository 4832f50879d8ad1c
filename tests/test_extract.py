"""Link-extraction goldens — the reference's RequestExtractorSpec
(crawler-test/src/test/scala/processors/RequestExtractorSpec.scala:29-119)
re-expressed over span arrays."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler import extract, schemas


def _fetched(spark, rows):
    """rows: (url, body_html, location)"""
    data = [
        (
            url,
            tpd,
            [],
            i,
            0,
            [{"kind": "text", "text": body, "media_ref": "", "offset": 0}]
            if body is not None
            else [],
            loc,
        )
        for i, (url, tpd, body, loc) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "url string, tpd string, provenance array<string>, seq long, fetch_ms long,"
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
        "location string",
    )


def _dests(df):
    return {r["dest_url"] for r in df.select("dest_url").collect()}


def test_internal_and_external(spark):
    f = _fetched(
        spark,
        [
            ("http://somesite.com", "somesite.com",
             "<a href='http://google.com'>I am a link</a>", None),
            ("http://twitter.com", "twitter.com",
             "<a href='http://twitter.com'>I am a link too.</a>"
             "<a href='/relative'>I am a link</a>", None),
        ],
    )
    out = extract.extract_links(f, same_tpd_only=False)
    assert _dests(out) == {
        "http://google.com",
        "http://twitter.com",
        "http://twitter.com/relative",
    }


def test_internal_only(spark):
    f = _fetched(
        spark,
        [
            ("http://somesite.com", "somesite.com",
             "<a href='http://google.com'>I am a link</a>", None),
            ("http://twitter.com", "twitter.com",
             "<a href='http://twitter.com'>I am a link too.</a>"
             "<a href='/relative'>I am a link</a>"
             "<a href='http://google.com'>x</a>", None),
        ],
    )
    out = extract.extract_links(f, same_tpd_only=True)
    assert _dests(out) == {"http://twitter.com", "http://twitter.com/relative"}


def test_spaces_escaped(spark):
    f = _fetched(
        spark,
        [("http://somesite.com/", "somesite.com",
          "<a href='http://somesite.com/I am a link/with'>spaces</a>", None)],
    )
    assert _dests(extract.extract_links(f, same_tpd_only=True)) == {
        "http://somesite.com/I%20am%20a%20link/with"
    }


def test_already_escaped_passthrough(spark):
    f = _fetched(
        spark,
        [("http://somesite.com/", "somesite.com",
          "<a href='http://somesite.com/I%20am%20a%20link/with'>spaces</a>", None)],
    )
    assert _dests(extract.extract_links(f, same_tpd_only=True)) == {
        "http://somesite.com/I%20am%20a%20link/with"
    }


def test_location_absolute(spark):
    f = _fetched(
        spark,
        [
            ("http://somesite.com", "somesite.com", None, "http://www.somesite.com"),
            ("http://somesite.com", "somesite.com", None, "http://someothersite.com"),
        ],
    )
    out = extract.extract_links(f)
    assert _dests(out) == {"http://www.somesite.com", "http://someothersite.com"}
    assert {r["link_source"] for r in out.collect()} == {"location"}


def test_location_relative(spark):
    f = _fetched(
        spark,
        [
            ("http://somesite.com", "somesite.com", None, "/start"),
            ("http://somesite.com", "somesite.com", None, "/start with spaces"),
        ],
    )
    assert _dests(extract.extract_links(f)) == {
        "http://somesite.com/start",
        "http://somesite.com/start%20with%20spaces",
    }


def test_location_always_passes_tpd_filter(spark):
    # Location-header links pass even when cross-TPD (RequestExtractor.scala:95-100)
    f = _fetched(
        spark,
        [("http://somesite.com", "somesite.com", None, "http://other.com/x")],
    )
    assert _dests(extract.extract_links(f, same_tpd_only=True)) == {
        "http://other.com/x"
    }


def test_document_order_and_media_skip(spark):
    spans = [
        {"kind": "text", "text": "<a href='/a'>1</a><a href='/b'>2</a>", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "img://x", "offset": 1},
        {"kind": "text", "text": "<a href='/c'>3</a>", "media_ref": "", "offset": 2},
    ]
    df = spark.createDataFrame(
        [("http://h.example.com/p", "example.com", [], 0, 0, spans, None)],
        "url string, tpd string, provenance array<string>, seq long, fetch_ms long,"
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
        "location string",
    )
    out = extract.extract_links(df).orderBy("link_pos").collect()
    assert [r["dest_url"] for r in out] == [
        "http://h.example.com/a",
        "http://h.example.com/b",
        "http://h.example.com/c",
    ]
    media = extract.extract_media_refs(df.withColumn("doc_id", F.lit("d1")))
    assert [r["media_ref"] for r in media.collect()] == ["img://x"]


def test_scalar_twin_matches(spark):
    """py_extract_links (the oracle's kernel) agrees with the Spark path."""
    spans = [
        {"kind": "text", "text": "<a href='/a'>1</a><a href=\"b/c\">2</a>", "media_ref": "", "offset": 0},
    ]
    url = "http://h.example.com/dir/page"
    py = extract.py_extract_links(url, spans, "/redir")
    assert [(d, s) for d, s, _ in py] == [
        ("http://h.example.com/a", "content"),
        ("http://h.example.com/dir/b/c", "content"),
        ("http://h.example.com/redir", "location"),
    ]


def test_unquoted_href(spark):
    """Jsoup accepts unquoted attribute values: <a href=/x>."""
    f = _fetched(
        spark,
        [("http://somesite.com", "somesite.com",
          "<a href=/unquoted>1</a> <a href=http://other.com/abs>2</a>", None)],
    )
    assert _dests(extract.extract_links(f)) == {
        "http://somesite.com/unquoted",
        "http://other.com/abs",
    }


def test_entity_decoded_href(spark):
    """Jsoup returns attribute values entity-decoded: &amp; → &."""
    f = _fetched(
        spark,
        [("http://somesite.com", "somesite.com",
          "<a href='/p?a=1&amp;b=2'>1</a>", None)],
    )
    assert _dests(extract.extract_links(f)) == {"http://somesite.com/p?a=1&b=2"}


def test_base_href_override(spark):
    """<base href> rebases relative content links (Jsoup abs:href);
    Location headers still resolve against the host URI."""
    f = _fetched(
        spark,
        [("http://somesite.com/deep/page", "somesite.com",
          "<base href='http://cdn.somesite.com/root/'><a href='x.html'>1</a>",
          "/loc")],
    )
    assert _dests(extract.extract_links(f)) == {
        "http://cdn.somesite.com/root/x.html",
        "http://somesite.com/loc",
    }
    # scalar twin agrees
    spans = [{"kind": "text",
              "text": "<base href='http://cdn.somesite.com/root/'><a href='x.html'>1</a>",
              "media_ref": "", "offset": 0}]
    py = extract.py_extract_links("http://somesite.com/deep/page", spans, "/loc")
    assert {d for d, _, _ in py} == {
        "http://cdn.somesite.com/root/x.html",
        "http://somesite.com/loc",
    }


def test_location_links_order_first(spark):
    """headerLinks ++ bodyLinks (RequestExtractor.scala:24-26): the
    Location link sorts before every content link by link_pos."""
    f = _fetched(
        spark,
        [("http://somesite.com", "somesite.com",
          "<a href='/body1'>1</a>", "http://somesite.com/fromheader")],
    )
    out = extract.extract_links(f).orderBy("link_pos").collect()
    assert [r["dest_url"] for r in out] == [
        "http://somesite.com/fromheader",
        "http://somesite.com/body1",
    ]


def test_href_in_comment_or_script_not_extracted(spark):
    """A DOM parse never yields a[href] from comments or raw-text
    elements (script/style/textarea content is character data) —
    Jsoup's a[href] selector (RequestExtractor.scala:49-57) would not
    see these; the regex extractor must not either."""
    body = (
        "<!-- <a href='/in-comment'>x</a> -->"
        "<script>var s = \"<a href='/in-script'>x</a>\";</script>"
        "<style>.x { background: url(a) } /* <a href='/in-style'>x</a> */</style>"
        "<textarea><a href='/in-textarea'>x</a></textarea>"
        "<a href='/real'>kept</a>"
        "<!-- unterminated comment swallows the rest <a href='/after-eof'>"
    )
    f = _fetched(spark, [("http://somesite.com", "somesite.com", body, None)])
    assert _dests(extract.extract_links(f)) == {"http://somesite.com/real"}
    # scalar twin agrees
    spans = [{"kind": "text", "text": body, "media_ref": "", "offset": 0}]
    py = extract.py_extract_links("http://somesite.com", spans, None)
    assert [d for d, _, _ in py] == ["http://somesite.com/real"]


def test_base_href_in_comment_ignored(spark):
    """<base href> inside a comment must not rebase anything."""
    body = (
        "<!-- <base href='http://evil.example.com/'> -->"
        "<a href='rel.html'>1</a>"
    )
    f = _fetched(
        spark, [("http://somesite.com/dir/page", "somesite.com", body, None)]
    )
    assert _dests(extract.extract_links(f)) == {"http://somesite.com/dir/rel.html"}


def test_script_strip_preserves_following_links_order(spark):
    """Stripping is positional removal, not truncation: links after a
    stripped region keep extracting, in document order."""
    body = (
        "<a href='/a'>1</a>"
        "<script type='text/javascript'>document.write('<a href=\"/x\">')</script>"
        "<a href='/b'>2</a>"
    )
    f = _fetched(spark, [("http://s.com", "s.com", body, None)])
    out = extract.extract_links(f).orderBy("link_pos").collect()
    assert [r["dest_url"] for r in out] == ["http://s.com/a", "http://s.com/b"]


def test_fetchsim_headers_and_content_type(spark):
    """fetch-sim emits response headers (Content-Type / Location) and the
    case-insensitively derived content_type column; connection failures
    carry no headers."""
    from crawler import fetchsim, schemas

    pages = spark.createDataFrame(
        [
            ("http://a.com/pdf", "a.com", 200, None, "d1", "application/pdf"),
            ("http://a.com/html", "a.com", 200, None, "d2", None),
            ("http://a.com/redir", "a.com", 301, "/", None, None),
        ],
        schemas.PAGES,
    )
    docs = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}]),
         ("d2", [{"kind": "text", "text": "y", "media_ref": "", "offset": 0}])],
        schemas.DOCUMENTS_SPANS,
    )
    sched = spark.createDataFrame(
        [(u, u, 0, "a.com", "a.com", "GET", [], None, [], 0.0, i, 0, 0, 100, 0)
         for i, u in enumerate(
             ["http://a.com/pdf", "http://a.com/html", "http://a.com/redir",
              "http://a.com/other", "http://nowhere.zz/x"])],
        "url string, url_canon string, url_hash long, host string, tpd string,"
        "method string, req_headers array<struct<name:string,value:string>>,"
        "req_entity binary, provenance array<string>, priority double, seq long,"
        "not_before_wave int, wave_added int, delay_ms int, fetch_ms long",
    ).withColumn("host", F.when(F.col("url").contains("nowhere"),
                                F.lit("nowhere.zz")).otherwise(F.col("host")))
    out = {r["url"]: r for r in fetchsim.fetch(sched, pages, docs).collect()}
    assert out["http://a.com/pdf"]["content_type"] == "application/pdf"
    assert out["http://a.com/html"]["content_type"] == "text/html"
    hdrs = {h["name"]: h["value"] for h in out["http://a.com/redir"]["response_headers"]}
    assert hdrs == {"Location": "/"}
    assert out["http://a.com/redir"]["content_type"] is None
    # default route body is text/html; unknown host carries nothing
    assert out["http://a.com/other"]["content_type"] == "text/html"
    assert out["http://nowhere.zz/x"]["response_headers"] is None
    assert out["http://nowhere.zz/x"]["status"] == 0
