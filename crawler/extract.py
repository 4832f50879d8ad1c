"""Link extraction over interleaved span arrays (SURVEY.md §2.3 P1-P3, F5).

Reference behavior (crawler-lib/src/main/scala/processors/RequestExtractor.scala):
  P1 extractFromContent (:49-57)  — parse HTML body, take every a[href],
     absolutize against the item's baseUri, trim, drop empties, escape
     invalid URIs (UrlEscapers fallback :38-45); link_source='content'.
  P2 extractFromHeaders (:59-68)  — every Location header, absolutized
     against hostUri; link_source='location'.
  F5 SameTPDLinkFilter (:71-81)   — when internalOnly, keep content links
     only if tpd(dest)==tpd(src); location links always pass.
  P3 RequestExtractor (:84-116)   — emit WrappedHttpRequest per link with
     provenance = source.provenance :+ source.url (last 10).

Spark shape: spans are exploded JVM-side (posexplode keeps document
order), href matching is a pandas Arrow UDF using pd.Series.str.findall
(C-level regex over the whole batch), URL resolution is vectorized with
masked fast paths (absolute / root-relative) and a urljoin fallback for
the rare deep-relative case.  No per-row Python UDFs.
"""

from __future__ import annotations

import html
import re
from urllib.parse import quote, urljoin

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from . import urlnorm

#: quote-aware <a> tag scan (tokenizer-grade, matching Jsoup's a[href]
#: selector, RequestExtractor.scala:49-57): the attr region consumes
#: quoted chunks whole, so '>' inside a quoted attribute value does not
#: end the tag, and the href value is picked by a real attribute WALK
#: (`_href_of_tag`) instead of a substring match — `data-href=` or an
#: 'href=' inside another attribute's quoted value never false-match.
_A_TAG_RE = r"""(?is)<a(?=[\s/>])((?:"[^"]*"|'[^']*'|[^>])*)"""

#: first <base href> of the document — Jsoup resolves abs:href against
#: it when present (HTML spec: the first base element wins, globally)
_BASE_TAG_RE = r"""(?is)<base(?=[\s/>])((?:"[^"]*"|'[^']*'|[^>])*)"""

#: one attribute inside a tag's attr region: name [= value] with the
#: three HTML value forms (double-quoted / single-quoted / unquoted)
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)


def _href_of_tag(attrs: str) -> str | None:
    """First href attribute of a tag's attr region, entity-decoded
    (Jsoup returns attribute values decoded; first occurrence wins per
    the HTML spec's duplicate-attribute rule).  None = no href VALUE
    (absent, or a bare `href` flag) → the tag yields no link."""
    for m in _ATTR_RE.finditer(attrs):
        if m.group(1).lower() == "href":
            v = m.group(2)
            if v is None:
                return None
            if v[:1] in "\"'":
                v = v[1:-1]
            return html.unescape(v) if "&" in v else v
    return None

#: chars legal in a URI — if a URL matches, pass through unchanged
#: (already-escaped golden); else percent-escape (space→%20 golden)
_URI_OK = re.compile(r"^[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]*$")
_ESCAPE_SAFE = "-._~:/?#[]@!$&'()*+,;=%"

_ABS_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://")

#: regions a DOM parse never yields a[href] elements from — comments and
#: raw-text elements (script/style/textarea content is character data to
#: the HTML tokenizer).  Jsoup's a[href] selector (RequestExtractor
#: .scala:49-57) therefore never sees anchors inside them; the regex
#: extractor must strip them first or it over-extracts.  Single-pass
#: alternation mirrors tokenizer behavior: whichever construct opens
#: first swallows the region (a <script> inside a comment is not an
#: element; a <!-- inside script does not open a comment).  Unterminated
#: blocks run to end-of-input, as in the HTML spec's EOF handling.
_STRIP_RE = r"(?is)<!--.*?(?:-->|$)|<(script|style|textarea)\b[^>]*>.*?(?:</\1\s*>|$)"


def _strip_dead_regions(text: pd.Series) -> pd.Series:
    """Vectorized removal of comment / raw-text regions (C regex pass)."""
    return text.str.replace(_STRIP_RE, "", regex=True)


def escape_url(u: str) -> str:
    """UrlEscapers fallback semantics (RequestExtractor.scala:38-45):
    escape only when the URI is invalid; never double-escape."""
    if _URI_OK.match(u):
        return u
    return quote(u, safe=_ESCAPE_SAFE)


def resolve_link(base: str, href: str) -> str:
    """Absolutize one href against base, reference-style."""
    href = href.strip()
    if not href:
        return ""
    return escape_url(urljoin(base, href))


def _resolve_vec(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    """Vectorized resolve: masked fast paths cover ~all of a web corpus
    (absolute links and root-relative links); deep-relative falls back to
    urljoin row-wise."""
    hrefs = hrefs.fillna("").str.strip()
    out = pd.Series("", index=hrefs.index, dtype="object")
    is_abs = hrefs.str.match(_ABS_RE.pattern)
    out[is_abs] = hrefs[is_abs]
    is_root = ~is_abs & hrefs.str.startswith("/") & ~hrefs.str.startswith("//")
    if is_root.any():
        host_uris = urlnorm.pd_host_uri(bases[is_root])
        out[is_root] = host_uris.str.cat(hrefs[is_root])
    rest = ~is_abs & ~is_root & (hrefs != "")
    if rest.any():
        out[rest] = [urljoin(b, h) for b, h in zip(bases[rest], hrefs[rest])]
    # escape pass, vectorized gate: only rows with illegal chars re-enter python
    bad = ~out.str.match(_URI_OK.pattern) & (out != "")
    if bad.any():
        out[bad] = [quote(u, safe=_ESCAPE_SAFE) for u in out[bad]]
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def find_hrefs_udf(text: pd.Series) -> pd.Series:
    """All a[href] values of a text span, in document order.  The tag
    scan is one C-level regex pass over the whole batch; the attribute
    walk runs once per ANCHOR TAG (list-building granularity, same as
    any per-match pick), not per row or per character."""
    matches = _strip_dead_regions(text.fillna("")).str.findall(_A_TAG_RE)
    return matches.map(
        lambda ms: [h for h in (_href_of_tag(m) for m in ms) if h is not None]
    )


#: full anchor element: the open tag's attr region (group 1, same shape
#: as _A_TAG_RE) plus the inner markup (group 2).  The inner text ends
#: at the close tag, at the NEXT <a> open tag (the HTML tree builder
#: implicitly closes an open anchor there — nested <a> is illegal), or
#: at end-of-input (spec EOF handling).  The terminator is a LOOKAHEAD,
#: not consumed, so a following anchor is still found by the same scan.
_A_ELEM_RE = r"""(?is)<a(?=[\s/>])((?:"[^"]*"|'[^']*'|[^>])*)>(.*?)(?=</a\s*>|<a[\s/>]|$)"""

#: any tag inside anchor inner markup — stripped for .text() semantics
_INNER_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def _anchor_text(inner: str) -> str:
    """Jsoup Element.text() semantics for the anchor's inner markup:
    drop nested tags, decode entities, collapse whitespace, trim."""
    t = _INNER_TAG_RE.sub(" ", inner)
    if "&" in t:
        t = html.unescape(t)
    return _WS_RE.sub(" ", t).strip()


@pandas_udf(
    T.ArrayType(
        T.StructType(
            [
                T.StructField("href", T.StringType()),
                T.StructField("anchor", T.StringType()),
            ]
        )
    )
)
def find_links_udf(text: pd.Series) -> pd.Series:
    """(href, anchor-text) pairs of every a[href] element, in document
    order — the web-graph anchor-text signal (what link corpora like
    anchor-text training sets aggregate per target).  Same tag scan and
    attribute walk as find_hrefs_udf; the anchor text follows Jsoup's
    Element.text() (nested tags dropped, entities decoded, whitespace
    collapsed).  One C-level regex pass per batch; the per-match walk
    is list-building granularity, not per row."""
    matches = _strip_dead_regions(text.fillna("")).str.findall(_A_ELEM_RE)
    return matches.map(
        lambda ms: [
            {"href": h, "anchor": _anchor_text(inner)}
            for h, inner in ((_href_of_tag(attrs), inner) for attrs, inner in ms)
            if h is not None
        ]
    )


@pandas_udf(T.StringType())
def find_base_href_udf(text: pd.Series) -> pd.Series:
    """First <base href=...> of the document text ('' when absent) —
    per the HTML spec, the first base element WITH an href wins."""
    matches = _strip_dead_regions(text.fillna("")).str.findall(_BASE_TAG_RE)
    return matches.map(
        lambda ms: next(
            (h for h in (_href_of_tag(m) for m in ms) if h is not None), ""
        )
    )


@pandas_udf(T.StringType())
def resolve_url_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    return _resolve_vec(base, href)


@pandas_udf(T.StringType())
def tpd_of_url_udf(url: pd.Series) -> pd.Series:
    return urlnorm.pd_tpd(urlnorm.pd_host(url))


#: position assigned to location-header links: the reference's extractor
#: returns headerLinks ++ bodyLinks (RequestExtractor.scala:24-26), i.e.
#: Location links come FIRST — so they sort before every content link
LOCATION_LINK_POS = -1

#: content link_pos = span_offset · SPAN_POS_STRIDE + href_index; wide
#: enough that a span's links never collide with the next span's
SPAN_POS_STRIDE = 1 << 20

#: within-span offset for sitemap <loc> links: they sort after the same
#: span's a[href] links (href index < 2^19 in any real document) and
#: before the next span's
SITEMAP_LOC_POS = 1 << 19

#: <loc> value pattern (sitemaps.org): tag pair, optional inner
#: whitespace; (?is) = case-insensitive + dot-matches-newline.  Legal
#: in both Java regex (JVM regexp_extract_all) and Python re (twin).
_LOC_RE = r"(?is)<loc\s*>\s*(.*?)\s*</loc\s*>"


def sitemap_locs_expr(text_col) -> Column:
    """All <loc> values of a text span, in document order — pure JVM.

    XML entity decode is the five predefined entities, &amp; last (a
    sitemap is XML: &#-numeric refs are vanishingly rare in <loc> and
    intentionally not handled — documented divergence from html
    .unescape, mirrored exactly by py_find_locs).  Only absolute
    scheme://… survivors are returned (the protocol requires full
    URLs), so no base resolution happens downstream."""
    locs = F.regexp_extract_all(text_col, F.lit(_LOC_RE), 1)
    decoded = F.transform(
        locs,
        lambda x: F.replace(
            F.replace(
                F.replace(
                    F.replace(
                        F.replace(x, F.lit("&lt;"), F.lit("<")),
                        F.lit("&gt;"),
                        F.lit(">"),
                    ),
                    F.lit("&quot;"),
                    F.lit('"'),
                ),
                F.lit("&apos;"),
                F.lit("'"),
            ),
            F.lit("&amp;"),
            F.lit("&"),
        ),
    )
    return F.filter(decoded, lambda x: x.rlike(_ABS_RE.pattern))


def py_find_locs(text: str) -> list[str]:
    """Scalar twin of sitemap_locs_expr (same entity chain, same
    absolute-only filter)."""
    out = []
    for raw in re.findall(_LOC_RE, text or ""):
        v = (
            raw.replace("&lt;", "<")
            .replace("&gt;", ">")
            .replace("&quot;", '"')
            .replace("&apos;", "'")
            .replace("&amp;", "&")
        )
        if _ABS_RE.match(v):
            out.append(v)
    return out


def extract_links(
    fetched: DataFrame,
    same_tpd_only: bool = False,
    source_cols: tuple[str, ...] = ("url", "tpd", "provenance", "seq"),
    parse_sitemap_locs: bool = False,
) -> DataFrame:
    """fetched(url, tpd, spans, location, provenance, seq, ...) →
    links(source_cols..., dest_url, link_source, link_pos).

    link_pos is the deterministic within-document order (span offset ×
    stride + href index; location links first, matching the reference's
    headerLinks ++ bodyLinks) used for within-wave first-wins dedup
    tie-breaks and frontier FIFO seq assignment.

    parse_sitemap_locs (config.ingest_sitemaps): documents whose text
    contains <urlset / <sitemapindex additionally yield their <loc>
    entries (absolute URLs only, pure-JVM extraction) as
    link_source='sitemap_loc', ordered after the same span's hrefs.
    """
    src = [F.col(c) for c in source_cols]
    page_base = urlnorm.base_uri_expr("url")
    # document-level <base href> override (Jsoup abs:href semantics):
    # cheap JVM instr-gate — only documents containing '<base' pay the
    # extra regex scan over their concatenated text spans
    doc_text = F.concat_ws(
        "",
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
    )
    base = F.when(
        F.instr(F.lower(doc_text), "<base") > 0,
        F.coalesce(
            F.nullif(resolve_url_udf(page_base, find_base_href_udf(doc_text)), F.lit("")),
            page_base,
        ),
    ).otherwise(page_base)

    spans = fetched.select(
        *src,
        base.alias("_base"),
        F.posexplode_outer("spans").alias("_span_pos", "_span"),
    ).where(F.col("_span.kind") == "text")

    content = (
        spans.select(
            *src,
            F.col("_base"),
            F.col("_span.offset").alias("_span_off"),
            F.posexplode(find_hrefs_udf(F.col("_span.text"))).alias(
                "_href_pos", "_href"
            ),
        )
        .withColumn("dest_url", resolve_url_udf(F.col("_base"), F.col("_href")))
        .where(F.col("dest_url") != "")
        .select(
            *src,
            "dest_url",
            F.lit("content").alias("link_source"),
            (
                F.col("_span_off").cast("long") * F.lit(SPAN_POS_STRIDE)
                + F.col("_href_pos")
            ).alias("link_pos"),
        )
    )
    if parse_sitemap_locs:
        # doc-level gate: only sitemap-looking documents pay the loc
        # scan (instr over the already-built doc_text, pure JVM)
        looks_sm = (F.instr(F.lower(doc_text), "<urlset") > 0) | (
            F.instr(F.lower(doc_text), "<sitemapindex") > 0
        )
        locs = (
            fetched.where(looks_sm)
            .select(*src, F.posexplode_outer("spans").alias("_span_pos", "_span"))
            .where(F.col("_span.kind") == "text")
            .select(
                *src,
                F.col("_span.offset").alias("_span_off"),
                F.posexplode(sitemap_locs_expr(F.col("_span.text"))).alias(
                    "_loc_pos", "dest_url"
                ),
            )
            .select(
                *src,
                "dest_url",
                F.lit("sitemap_loc").alias("link_source"),
                (
                    F.col("_span_off").cast("long") * F.lit(SPAN_POS_STRIDE)
                    + F.lit(SITEMAP_LOC_POS)
                    + F.col("_loc_pos")
                ).alias("link_pos"),
            )
        )
        content = content.unionByName(locs)

    if same_tpd_only:
        content = content.where(F.col("tpd") == tpd_of_url_udf(F.col("dest_url")))

    location = (
        fetched.where(F.col("location").isNotNull() & (F.col("location") != ""))
        .select(
            *src,
            resolve_url_udf(urlnorm.host_uri_expr("url"), F.col("location")).alias(
                "dest_url"
            ),
            F.lit("location").alias("link_source"),
            F.lit(LOCATION_LINK_POS).cast("long").alias("link_pos"),
        )
        .where(F.col("dest_url") != "")
    )
    return content.unionByName(location)


def extract_media_refs(fetched: DataFrame) -> DataFrame:
    """Multimodal sidecar: one row per media span — (doc_id, url,
    media_ref, offset).  Decode/feature-extraction stages plug in behind
    this as mapInPandas over the binary refs (see textops.media_stub)."""
    return (
        fetched.select(
            "doc_id", "url", F.posexplode("spans").alias("_pos", "_span")
        )
        .where(F.col("_span.kind") == "media")
        .select(
            "doc_id",
            "url",
            F.col("_span.media_ref").alias("media_ref"),
            F.col("_span.offset").alias("offset"),
        )
    )


# scalar twin for the oracle --------------------------------------------------

_A_TAG_SCALAR_RE = re.compile(_A_TAG_RE)
_BASE_TAG_SCALAR_RE = re.compile(_BASE_TAG_RE)
_STRIP_SCALAR_RE = re.compile(_STRIP_RE)


def py_find_hrefs(text: str) -> list[str]:
    """Scalar twin of find_hrefs_udf (post-strip tag scan + attr walk)."""
    stripped = _STRIP_SCALAR_RE.sub("", text or "")
    out = []
    for m in _A_TAG_SCALAR_RE.finditer(stripped):
        h = _href_of_tag(m.group(1))
        if h is not None:
            out.append(h)
    return out


_A_ELEM_SCALAR_RE = re.compile(_A_ELEM_RE)


def py_find_links(text: str) -> list[tuple[str, str]]:
    """Scalar twin of find_links_udf: (href, anchor-text) pairs."""
    stripped = _STRIP_SCALAR_RE.sub("", text or "")
    out = []
    for m in _A_ELEM_SCALAR_RE.finditer(stripped):
        h = _href_of_tag(m.group(1))
        if h is not None:
            out.append((h, _anchor_text(m.group(2))))
    return out


def py_find_base_href(text: str) -> str:
    """Scalar twin of find_base_href_udf."""
    stripped = _STRIP_SCALAR_RE.sub("", text or "")
    for m in _BASE_TAG_SCALAR_RE.finditer(stripped):
        h = _href_of_tag(m.group(1))
        if h is not None:
            return h
    return ""


def py_extract_links(
    url: str,
    spans: list[dict],
    location: str | None,
    same_tpd_only: bool = False,
    parse_sitemap_locs: bool = False,
) -> list[tuple[str, str, int]]:
    """Single-doc extraction, identical semantics — (dest, source, pos)."""
    base = re.sub(r"[?#].*$", "", url)
    doc_text = "".join(s["text"] or "" for s in spans or [] if s["kind"] == "text")
    if "<base" in doc_text.lower():
        bh = py_find_base_href(doc_text)
        if bh:
            resolved = resolve_link(base, bh)
            base = resolved or base
    lower_doc = doc_text.lower()
    looks_sm = parse_sitemap_locs and (
        "<urlset" in lower_doc or "<sitemapindex" in lower_doc
    )
    out: list[tuple[str, str, int]] = []
    for span in spans or []:
        if span["kind"] != "text":
            continue
        for i, href in enumerate(py_find_hrefs(span["text"])):
            dest = resolve_link(base, href)
            if not dest:
                continue
            if same_tpd_only and urlnorm.tpd_of(dest) != urlnorm.tpd_of(url):
                continue
            out.append((dest, "content", span["offset"] * SPAN_POS_STRIDE + i))
        if looks_sm:
            for i, dest in enumerate(py_find_locs(span["text"])):
                if same_tpd_only and urlnorm.tpd_of(dest) != urlnorm.tpd_of(url):
                    continue
                out.append(
                    (
                        dest,
                        "sitemap_loc",
                        span["offset"] * SPAN_POS_STRIDE + SITEMAP_LOC_POS + i,
                    )
                )
    if location:
        m = re.match(urlnorm._HOSTURI_RE, url)
        host_uri = m.group(1) if m else url
        dest = resolve_link(host_uri, location)
        if dest:
            out.append((dest, "location", LOCATION_LINK_POS))
    return out
