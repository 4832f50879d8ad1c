"""URL kernel: canonicalize / host / tpd / base_uri.

Reference semantics:
  - canonicalize (UrlNormalizer.scala:11-27): cut at the LAST '#', then
    strip one trailing '/'.  Dead code in the reference's live path —
    adopted here as the pre-hash canonicalizer per north_rule
    ("canonicalized+murmur3-hashed URLs").
  - host / hostUri / baseUri (Requests.scala:41-48): java.net.URI parts.
  - topPrivateDomain (Requests.scala:50-53): Guava eTLD+1, fallback
    "notpd" for hosts not under a public suffix (localhost, IPs, bare
    TLDs).  The suffix data is a curated snapshot of the public suffix
    list (crawler/psl.py — every ccTLD, major gTLDs, common ccTLD
    second-levels, popular private suffixes like github.io); the
    reference's pinned goldens (HttpRequestSpec.scala:22-29:
    www.google.com → google.com, amazon.co.jp / blog.amazon.co.jp →
    amazon.co.jp) are covered by it.

Two twin implementations, tested equal on goldens:
  *_expr   — pyspark Column expressions (JVM-side, codegen'd; the hot path)
  pd_*     — pandas-vectorized (used by the Arrow-UDF extractor + oracle)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F

from .psl import SUFFIX2, TLDS  # noqa: F401  (re-exported; tests import from here)

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"
_HOST_RE = _SCHEME_RE + r"(?:[^/?#@]*@)?([^/?#:]*)"
_HOSTURI_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)"
_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"

NOTPD = "notpd"


# ------------------------------------------------------------- Spark exprs


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonicalize_expr(url: str | Column) -> Column:
    """strip from last '#' (regex .* is greedy → matches last), then one
    trailing '/'."""
    c = _c(url)
    return F.regexp_replace(F.regexp_replace(c, "#[^#]*$", ""), "/$", "")


def host_expr(url: str | Column) -> Column:
    return F.lower(F.regexp_extract(_c(url), _HOST_RE, 1))


def host_uri_expr(url: str | Column) -> Column:
    """scheme://authority (Requests.scala:44-45)."""
    return F.regexp_extract(_c(url), _HOSTURI_RE, 1)


def base_uri_expr(url: str | Column) -> Column:
    """scheme://authority/path — query+fragment stripped (Requests.scala:47-48)."""
    return F.regexp_replace(_c(url), r"[?#].*$", "")


def tpd_expr(host: str | Column) -> Column:
    """eTLD+1 with 'notpd' fallback, as a pure JVM expression (no UDF).

    labels = split(host,'.'); notpd when: <2 labels, IPv4, or TLD not in
    TLDS; else last-3 labels when last-2 ∈ SUFFIX2 (and ≥3 labels), else
    last-2.
    """
    h = F.lower(_c(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    last2 = F.concat_ws(".", F.element_at(labels, -2), last1)
    last3 = F.when(
        n >= 3, F.concat_ws(".", F.element_at(labels, -3), last2)
    ).otherwise(F.lit(NOTPD))
    # isin over the big literal sets compiles to Catalyst InSet (hash
    # lookup) — O(1) per row however large the vendored PSL grows
    return (
        F.when(n < 2, F.lit(NOTPD))
        .when(h.rlike(_IPV4_RE), F.lit(NOTPD))
        .when(~last1.isin(*sorted(TLDS)), F.lit(NOTPD))
        .when(last2.isin(*sorted(SUFFIX2)), last3)
        .otherwise(last2)
    )


def provenance_expr(
    src_provenance: str | Column, src_url: str | Column, max_provenance: int = 10
) -> Column:
    """withProvenance (Requests.scala:62-65): source.provenance :+
    source.url, keep last `max_provenance` — pure array functions."""
    appended = F.concat(_c(src_provenance), F.array(_c(src_url)))
    return F.slice(appended, F.greatest(F.size(appended) - max_provenance + 1, F.lit(1)), max_provenance)


# ------------------------------------------------------------ pandas twins


def pd_canonicalize(urls: pd.Series) -> pd.Series:
    return urls.str.replace(r"#[^#]*$", "", regex=True).str.replace(
        r"/$", "", regex=True
    )


def pd_host(urls: pd.Series) -> pd.Series:
    return urls.str.extract(_HOST_RE, expand=False).fillna("").str.lower()


def pd_host_uri(urls: pd.Series) -> pd.Series:
    return urls.str.extract(_HOSTURI_RE, expand=False).fillna("")


def pd_base_uri(urls: pd.Series) -> pd.Series:
    return urls.str.replace(r"[?#].*$", "", regex=True)


def _tpd_one(host: str) -> str:
    if not host:
        return NOTPD
    host = host.lower()
    if re.match(_IPV4_RE, host):
        return NOTPD
    labels = host.split(".")
    if len(labels) < 2 or labels[-1] not in TLDS:
        return NOTPD
    last2 = ".".join(labels[-2:])
    if last2 in SUFFIX2:
        return ".".join(labels[-3:]) if len(labels) >= 3 else NOTPD
    return last2


def pd_tpd(hosts: pd.Series) -> pd.Series:
    # small per-batch memo — host cardinality per Arrow batch is low
    memo: dict[str, str] = {}

    def f(h: str) -> str:
        r = memo.get(h)
        if r is None:
            r = memo[h] = _tpd_one(h)
        return r

    return hosts.map(f)


# scalar conveniences for the oracle
def canonicalize(url: str) -> str:
    i = url.rfind("#")
    if i > -1:
        url = url[:i]
    return url[:-1] if url.endswith("/") else url


def host_of(url: str) -> str:
    m = re.match(_HOST_RE, url)
    return m.group(1).lower() if m else ""


def tpd_of(url_or_host: str) -> str:
    h = host_of(url_or_host) if "://" in url_or_host else url_or_host.lower()
    return _tpd_one(h)
