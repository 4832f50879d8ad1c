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

from . import psl
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
    """eTLD+1 with 'notpd' fallback, as a pure JVM expression (no UDF),
    under FULL PSL rule semantics (exact + wildcard + exception rules
    at any depth, longest match wins — see crawler/psl.py docstring).

    Shape: one CASE with ≤ (exception depths + suffix depths) branches;
    each branch is an InSet membership test over the last-k labels —
    Catalyst compiles isin over big literal sets to a hash lookup, so
    cost per row is O(depths), independent of PSL size.  Matches
    Guava's InternetDomainName.topPrivateDomain() on registrable
    hosts and maps its IllegalStateException cases to 'notpd'
    (Requests.scala:50-53).
    """
    h = F.lower(_c(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)

    def lastk(k: int) -> Column:
        # concat_ws skips nulls, so for n < k this yields fewer labels —
        # it can never string-equal a real k-label rule; the n >= k
        # guards below make that explicit anyway
        return F.concat_ws(".", *[F.element_at(labels, -i) for i in range(k, 0, -1)])

    expr = (
        F.when(n < 2, F.lit(NOTPD))
        .when(h.rlike(_IPV4_RE), F.lit(NOTPD))
        .when(~F.element_at(labels, -1).isin(*sorted(psl.RULES[1])), F.lit(NOTPD))
    )
    # exception rules first (they beat any wildcard they carve out):
    # the exception host itself is the registered domain
    for k in sorted(psl.EXCEPTIONS, reverse=True):
        expr = expr.when(
            (n >= k) & lastk(k).isin(*sorted(psl.EXCEPTIONS[k])), lastk(k)
        )
    # longest public suffix wins: walk depths deepest-first; a match at
    # depth k makes the registered domain the last k+1 labels (or notpd
    # when the host IS the suffix)
    for k in range(psl.MAX_SUFFIX_DEPTH, 1, -1):
        conds = []
        if k in psl.RULES:
            conds.append(lastk(k).isin(*sorted(psl.RULES[k])))
        if (k - 1) in psl.WILDBASES:
            conds.append(lastk(k - 1).isin(*sorted(psl.WILDBASES[k - 1])))
        if not conds:
            continue
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        expr = expr.when(
            (n >= k) & cond,
            F.when(n >= k + 1, lastk(k + 1)).otherwise(F.lit(NOTPD)),
        )
    # depth-1 default: known TLD, no deeper rule → last two labels
    return expr.otherwise(lastk(2))


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
    """Scalar twin of tpd_expr — identical full-PSL semantics."""
    if not host:
        return NOTPD
    host = host.lower()
    if re.match(_IPV4_RE, host):
        return NOTPD
    labels = host.split(".")
    n = len(labels)
    if n < 2 or labels[-1] not in psl.RULES[1]:
        return NOTPD
    for k in sorted(psl.EXCEPTIONS, reverse=True):
        if n >= k and ".".join(labels[-k:]) in psl.EXCEPTIONS[k]:
            return ".".join(labels[-k:])
    suffix_len = 1
    for k in range(2, psl.MAX_SUFFIX_DEPTH + 1):
        if n >= k and (
            ".".join(labels[-k:]) in psl.RULES.get(k, ())
            or ".".join(labels[-(k - 1):]) in psl.WILDBASES.get(k - 1, ())
        ):
            suffix_len = k
    if n < suffix_len + 1:
        return NOTPD  # the host IS a public suffix
    return ".".join(labels[-(suffix_len + 1):])


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
