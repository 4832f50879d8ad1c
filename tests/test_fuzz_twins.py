"""Twin-equivalence fuzz: the JVM Column expressions, the pandas
vectorized kernels and the scalar oracle kernels must agree on ANY
input, not just the goldens.  Seeded generative battery (deterministic,
seed=7) over URL-shaped and adversarial strings, asserted across all
three implementations in one Spark batch."""

from __future__ import annotations

import random

import pandas as pd

from crawler import extract, urlnorm

_SCHEMES = ["http://", "https://", "ftp://"]
_HOSTS = [
    "a.com", "www.google.com", "blog.amazon.co.jp", "x.y.z.co.uk", "localhost",
    "127.0.0.1", "foo.github.io", "a.b.com.tw", "weird", "x.internal",
    "UPPER.Example.COM", "h-1.h-2.example.dev", "port.example.com:8080",
    "user@auth.example.com", "trailing.dot.com.",
    # PSL rule-engine shapes: wildcard, exception, deep exact rules
    "www.ck", "foo.www.ck", "bar.ck", "foo.bar.ck",
    "city.kawasaki.jp", "a.city.kawasaki.jp", "x.foo.kawasaki.jp",
    "x.pvt.k12.ma.us", "a.school.k12.ma.us", "town.ma.us",
    "bucket.s3.amazonaws.com", "b.s3.dualstack.us-east-1.amazonaws.com",
    "x.y.elb.amazonaws.com",
]
_PATHS = [
    "", "/", "/a", "/a/b/c", "/a b/c", "/%20done", "/p?q=1&r=2", "/p#frag",
    "/p#a#b", "/p/", "//weird", "/~tilde/($)/x,y;z", "/ünïcode/π",
]


def _gen_urls(n: int = 400) -> list[str]:
    rng = random.Random(7)
    out = []
    for _ in range(n):
        out.append(
            rng.choice(_SCHEMES) + rng.choice(_HOSTS) + rng.choice(_PATHS)
        )
    return out


def test_url_kernel_twins_agree(spark):
    urls = _gen_urls()
    pdf = pd.Series(urls)
    df = spark.createDataFrame([(u,) for u in urls], "v string")

    for expr_fn, pd_fn, scalar_fn in (
        (urlnorm.canonicalize_expr, urlnorm.pd_canonicalize, urlnorm.canonicalize),
        (urlnorm.host_expr, urlnorm.pd_host, urlnorm.host_of),
    ):
        jvm = [r["o"] for r in df.select(expr_fn("v").alias("o")).collect()]
        vec = list(pd_fn(pdf))
        sca = [scalar_fn(u) for u in urls]
        assert jvm == vec == sca

    hosts = list(urlnorm.pd_host(pdf))
    jvm_tpd = [
        r["o"]
        for r in spark.createDataFrame([(h,) for h in hosts], "v string")
        .select(urlnorm.tpd_expr("v").alias("o"))
        .collect()
    ]
    vec_tpd = list(urlnorm.pd_tpd(pd.Series(hosts)))
    sca_tpd = [urlnorm._tpd_one(h) for h in hosts]
    assert jvm_tpd == vec_tpd == sca_tpd


def test_extract_twins_agree_on_fuzzed_html(spark):
    """Vectorized extractor == scalar twin on generated HTML with mixed
    quoting, entities, base tags, and junk."""
    rng = random.Random(11)
    frags = [
        "<a href='/x{i}'>q</a>", '<a href="/y{i}">d</a>', "<a href=/u{i}>u</a>",
        "<a href='/e{i}?a=1&amp;b=2'>e</a>", "plain text {i}",
        "<a data-x=1 href='/attr{i}'>m</a>", "<A HREF='/case{i}'>c</A>",
        "<a href=''>empty</a>", "<a href='  '>blank</a>", "<base href='/b{i}/'>",
    ]
    docs = []
    for d in range(60):
        body = " ".join(
            rng.choice(frags).replace("{i}", str(rng.randrange(50)))
            for _ in range(rng.randrange(1, 8))
        )
        docs.append((f"http://h{d % 5}.example.com/dir/page{d}", body))

    rows = [
        (url, "example.com", [], i, 0,
         [{"kind": "text", "text": body, "media_ref": "", "offset": 0}], None)
        for i, (url, body) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, tpd string, provenance array<string>, seq long, fetch_ms long,"
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
        "location string",
    )
    got = {}
    for r in extract.extract_links(df).collect():
        got.setdefault(r["url"], []).append((r["dest_url"], r["link_source"], r["link_pos"]))
    for url, body in docs:
        spans = [{"kind": "text", "text": body, "media_ref": "", "offset": 0}]
        expected = extract.py_extract_links(url, spans, None)
        assert sorted(got.get(url, [])) == sorted(expected), url


def test_find_links_udf_matches_scalar_twin(spark):
    """Arrow find_links_udf == py_find_links on fuzzed anchor HTML
    (href + anchor text; decoys, quoting forms, nesting, EOF)."""
    rng = random.Random(12)
    frags = [
        "<a href='/x{i}'><b>bold {i}</b> tail</a>",
        '<a href="/y{i}">w &amp; {i}</a>',
        "<a href=/u{i}>unquoted {i}</a>",
        "<a href='/n{i}'>outer <a href='/m{i}'>inner</a>",
        "<!--<a href='/dead{i}'>c</a>-->",
        "<script>'<a href=/js{i}>s</a>'</script>",
        "plain {i} words",
        "<a href='/eof{i}'>runs to end",
    ]
    texts = []
    for d in range(60):
        texts.append(" ".join(
            rng.choice(frags).replace("{i}", str(rng.randrange(50)))
            for _ in range(rng.randrange(1, 8))
        ))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {
        r["i"]: [(l["href"], l["anchor"]) for l in r["ls"]]
        for r in df.select("i", extract.find_links_udf("text").alias("ls")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == extract.py_find_links(t), t
