"""URL kernel goldens (FIXTURES.md §7; reference HttpRequestSpec +
UrlNormalizer semantics).  Every case asserted on BOTH twins: the JVM
Column expression and the pandas implementation."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crawler import urlnorm

CANON = [
    ("http://a.com/p#frag", "http://a.com/p"),
    ("http://a.com/p/", "http://a.com/p"),
    ("http://a.com/p#a#b", "http://a.com/p#a"),  # lastIndexOf('#')
    ("http://a.com/", "http://a.com"),
    ("http://a.com/p?q=1", "http://a.com/p?q=1"),
]

TPD = [
    ("www.google.com", "google.com"),
    ("google.com", "google.com"),
    ("amazon.co.jp", "amazon.co.jp"),
    ("blog.amazon.co.jp", "amazon.co.jp"),
    ("localhost", "notpd"),
    ("127.0.0.1", "notpd"),
    ("some.weird.internal", "notpd"),
    ("co.jp", "notpd"),
    ("h003.example.com", "example.com"),
    ("mega.example.com", "example.com"),
]

BASE = [
    (
        "http://www.google.com/some/base/uri-comes-here?aa",
        "http://www.google.com/some/base/uri-comes-here",
    ),
    ("http://a.com/p#frag", "http://a.com/p"),
]

HOST = [
    ("http://localhost:9090/crawl/1", "localhost"),
    ("http://user@h1.example.com:8080/x?q", "h1.example.com"),
    ("https://WWW.Google.COM/", "www.google.com"),
]


def _spark_eval(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["o"] for r in df.select(expr_fn("v").alias("o")).collect()]


def test_canonicalize(spark):
    ins = [i for i, _ in CANON]
    outs = [o for _, o in CANON]
    assert _spark_eval(spark, urlnorm.canonicalize_expr, ins) == outs
    assert list(urlnorm.pd_canonicalize(pd.Series(ins))) == outs
    assert [urlnorm.canonicalize(i) for i in ins] == outs


def test_tpd(spark):
    ins = [i for i, _ in TPD]
    outs = [o for _, o in TPD]
    assert _spark_eval(spark, urlnorm.tpd_expr, ins) == outs
    assert list(urlnorm.pd_tpd(pd.Series(ins))) == outs
    assert [urlnorm._tpd_one(i) for i in ins] == outs


def test_base_uri(spark):
    ins = [i for i, _ in BASE]
    outs = [o for _, o in BASE]
    assert _spark_eval(spark, urlnorm.base_uri_expr, ins) == outs
    assert list(urlnorm.pd_base_uri(pd.Series(ins))) == outs


def test_host(spark):
    ins = [i for i, _ in HOST]
    outs = [o for _, o in HOST]
    assert _spark_eval(spark, urlnorm.host_expr, ins) == outs
    assert list(urlnorm.pd_host(pd.Series(ins))) == outs
    assert [urlnorm.host_of(i) for i in ins] == outs


def test_provenance_append_keeps_last_10(spark):
    df = spark.createDataFrame(
        [(list(map(str, range(12))), "src")], "prov array<string>, src string"
    )
    out = df.select(
        urlnorm.provenance_expr("prov", "src", 10).alias("p")
    ).collect()[0]["p"]
    assert out == [str(i) for i in range(3, 12)] + ["src"]
    assert len(out) == 10


def test_tpd_psl_snapshot(spark):
    """Vendored-PSL cases beyond the original subset: multi-level ccTLD
    registrations and PSL private-section suffixes (github.io)."""
    cases = [
        ("foo.github.io", "foo.github.io"),  # private suffix: eTLD+1 is 3 labels
        ("x.com.tw", "x.com.tw"),
        ("a.b.com.tw", "b.com.tw"),
        ("shop.example.co.uk", "example.co.uk"),
        ("gov.uk", "notpd"),  # bare public suffix
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("foo.blogspot.com", "foo.blogspot.com"),
        ("a.example.dev", "example.dev"),
        ("x.y.example.com.br", "example.com.br"),
    ]
    ins = [i for i, _ in cases]
    outs = [o for _, o in cases]
    assert [urlnorm._tpd_one(i) for i in ins] == outs
    assert _spark_eval(spark, urlnorm.tpd_expr, ins) == outs
    assert list(urlnorm.pd_tpd(pd.Series(ins))) == outs


def test_tpd_psl_rule_engine(spark):
    """Full PSL semantics (VERDICT r2 #4): wildcard rules (*.ck,
    *.kawasaki.jp), exception rules (!www.ck, !city.kawasaki.jp), and
    3+-label suffixes (k12.ma.us, pvt.k12.ma.us, s3.dualstack...),
    longest-match-wins — Guava InternetDomainName.topPrivateDomain()
    parity (Requests.scala:50-53), IllegalState cases → 'notpd'."""
    cases = [
        # exception rules: the exception host IS the registered domain
        ("www.ck", "www.ck"),
        ("foo.www.ck", "www.ck"),
        ("city.kawasaki.jp", "city.kawasaki.jp"),
        ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
        # wildcard rules: children of the base are public suffixes
        ("bar.ck", "notpd"),
        ("foo.bar.ck", "foo.bar.ck"),
        ("foo.kawasaki.jp", "notpd"),
        ("x.foo.kawasaki.jp", "x.foo.kawasaki.jp"),
        ("x.bd", "notpd"),
        ("site.x.bd", "site.x.bd"),
        # deep exact rules, longest match wins
        ("x.pvt.k12.ma.us", "x.pvt.k12.ma.us"),
        ("pvt.k12.ma.us", "notpd"),
        ("school.k12.ma.us", "school.k12.ma.us"),
        ("a.school.k12.ma.us", "school.k12.ma.us"),
        ("town.ma.us", "town.ma.us"),
        ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
        ("b.s3.dualstack.us-east-1.amazonaws.com",
         "b.s3.dualstack.us-east-1.amazonaws.com"),
        ("x.y.elb.amazonaws.com", "x.y.elb.amazonaws.com"),
        ("y.elb.amazonaws.com", "notpd"),
        ("thing.amazonaws.com", "thing.amazonaws.com"),
        ("ck", "notpd"),
    ]
    ins = [i for i, _ in cases]
    outs = [o for _, o in cases]
    assert [urlnorm._tpd_one(i) for i in ins] == outs
    assert _spark_eval(spark, urlnorm.tpd_expr, ins) == outs
    assert list(urlnorm.pd_tpd(pd.Series(ins))) == outs
