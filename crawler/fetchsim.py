"""Network-free fetch stage (SURVEY.md §2.6 O5, §2.1 S11).

The reference fetches with async Spray HTTP
(CrawlServiceLike.scala:117-131); its tests replace that with a
deterministic local HTTP server (TestHttpServer.scala:18-44) / a canned
MockCrawler (MockCrawler.scala:14-17).  This sandbox has no network, so
the fetch stage is a JOIN of the wave's scheduled batch against the
synthetic web (`pages` + `documents_spans`), reproducing the test
server's routing exactly:

  - url found in pages        → that page's status/location/doc spans
  - url on a known host but   → 200 "OK!" (the server's default route,
    no matching route            TestHttpServer.scala:45)
  - unknown host              → status 0 (connection failure; dropped by
                                 the status filter, still consumed)

The stage is pluggable: a real fetcher is a mapInPandas over the same
scheduled batch (async HTTP inside the Arrow batch), same output schema.
Catalyst picks broadcast vs sort-merge for the join by size — at test
scale the web fixture broadcasts; gzip/deflate decode (P9) is parquet's
job here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

def _ok_spans():
    """Spans literal for the default "OK!" route (lazy: Column literals
    need an active SparkContext)."""
    return F.array(
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("OK!").alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )


def span_bytes_expr(spans_col):
    """Logical payload size: sum of span text+media_ref lengths — the
    CrawlStats byte accounting (CrawlStats.scala:9-14)."""
    return F.aggregate(
        F.coalesce(spans_col, F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>")),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.coalesce(F.length(s["text"]), F.lit(0))
        + F.coalesce(F.length(s["media_ref"]), F.lit(0)),
    )


def content_type_expr(headers_col) -> F.Column:
    """contentType = first header named Content-Type, case-insensitively
    (Responses.scala:37-39) — pure JVM filter over the header array."""
    c = F.col(headers_col) if isinstance(headers_col, str) else headers_col
    matches = F.filter(
        F.coalesce(c, F.array().cast("array<struct<name:string,value:string>>")),
        lambda h: F.lower(h["name"]) == "content-type",
    )
    return F.try_element_at(matches, F.lit(1))["value"]


def fetch(scheduled: DataFrame, pages: DataFrame, documents: DataFrame) -> DataFrame:
    """scheduled(url, ..., fetch_ms) → FETCHED rows (schemas.FETCHED)."""
    web = pages.join(documents, on="doc_id", how="left").select(
        F.col("url").alias("_page_url"),
        F.col("status").alias("_status"),
        F.col("location").alias("_location"),
        F.col("doc_id").alias("_doc_id"),
        F.col("spans").alias("_spans"),
        F.col("content_type").alias("_ct"),
    )
    known_hosts = pages.select(F.col("host").alias("_khost")).distinct()

    # no broadcast hints: the web fixture / host set are unbounded at
    # crawl scale — AQE broadcasts while small, shuffle-joins when not
    j = scheduled.join(
        web, scheduled["url"] == web["_page_url"], how="left"
    ).join(
        known_hosts,
        scheduled["host"] == F.col("_khost"),
        how="left",
    )

    hit = F.col("_page_url").isNotNull()
    host_known = F.col("_khost").isNotNull()
    status = (
        F.when(hit, F.col("_status"))
        .when(host_known, F.lit(200))  # default route "OK!"
        .otherwise(F.lit(0))  # connection failure
    )
    span_type = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    spans = (
        F.when(hit, F.col("_spans"))
        .when(host_known, _ok_spans())
        .otherwise(F.lit(None).cast(span_type))
    )
    # response headers mirror the test server: Content-Type for any
    # body-bearing response (page-declared type, text/html default) and
    # Location for redirects; connection failures (status 0) carry none
    ct = F.when(
        spans.isNotNull(), F.coalesce(F.when(hit, F.col("_ct")), F.lit("text/html"))
    )
    loc = F.when(hit, F.col("_location"))
    header_t = "array<struct<name:string,value:string>>"
    resp_headers = F.when(
        status > 0,
        F.filter(
            F.array(
                F.struct(F.lit("Content-Type").alias("name"), ct.alias("value")),
                F.struct(F.lit("Location").alias("name"), loc.alias("value")),
            ),
            lambda h: h["value"].isNotNull(),
        ),
    ).cast(header_t)

    return j.select(
        F.lit(None).cast("int").alias("wave"),  # filled by the loop
        F.col("url"),
        F.col("url_canon"),
        F.col("host"),
        F.col("tpd"),
        F.col("fetch_ms"),
        F.col("seq"),
        F.col("method"),
        status.cast("int").alias("status"),
        loc.alias("location"),
        F.when(hit, F.col("_doc_id")).alias("doc_id"),
        spans.alias("spans"),
        F.col("provenance"),
        F.col("req_headers"),
        F.col("req_entity"),
        resp_headers.alias("response_headers"),
        content_type_expr(resp_headers).alias("content_type"),
        span_bytes_expr(spans).alias("n_bytes"),
    )


def content_encoding_expr(headers_col) -> F.Column:
    """Content-Encoding header value, case-insensitively (same lookup
    shape as contentType, Responses.scala:37-39)."""
    c = F.col(headers_col) if isinstance(headers_col, str) else headers_col
    matches = F.filter(
        F.coalesce(c, F.array().cast("array<struct<name:string,value:string>>")),
        lambda h: F.lower(h["name"]) == "content-encoding",
    )
    return F.try_element_at(matches, F.lit(1))["value"]


#: decompressed-size cap per entity: an untrusted server's gzip/deflate
#: bomb (tiny payload → GBs of output) must not exhaust executor memory.
#: 64 MB is far above any sane HTML body; rows exceeding it keep their
#: COMPRESSED bytes and are flagged decode_status='truncated'.
DECODE_MAX_BYTES = 64 * 1024 * 1024

#: chunk size for the bounded decompressobj loop
_INFLATE_CHUNK = 1 << 20

_DECODE_RESULT = T.StructType(
    [
        T.StructField("entity", T.BinaryType()),
        # identity | decoded | error | unsupported | truncated
        T.StructField("status", T.StringType()),
    ]
)


def _inflate_capped(data: bytes, wbits: int, max_out: int):
    """Streamed zlib inflate with a hard output cap.  Returns the
    decoded bytes or None when the stream expands past `max_out`
    (bomb defense: never materializes more than max_out + one chunk).
    Raises zlib.error on corrupt input like plain decompress."""
    import zlib

    d = zlib.decompressobj(wbits)
    out = bytearray()
    buf = data
    while buf:
        chunk = d.decompress(buf, _INFLATE_CHUNK)
        out += chunk
        if len(out) > max_out:
            return None
        nxt = d.unconsumed_tail
        if not chunk and nxt == buf:  # no progress: corrupt-but-silent stream
            break
        buf = nxt
    out += d.flush()
    if len(out) > max_out:
        return None
    return bytes(out)


def _decode_one(data: bytes, name: str, max_out: int) -> tuple[bytes, str]:
    import zlib

    if name in ("", "identity"):
        return data, "identity"
    try:
        if name in ("gzip", "x-gzip"):
            # wbits=47: auto-detect gzip or zlib wrapper
            decoded = _inflate_capped(data, 47, max_out)
        elif name == "deflate":
            try:
                decoded = _inflate_capped(data, 15, max_out)  # RFC1950 zlib
            except zlib.error:
                decoded = _inflate_capped(data, -15, max_out)  # raw deflate
        else:
            # br / zstd / multi codings ('gzip, br') — not decodable here
            return data, "unsupported"
    except zlib.error:
        return data, "error"  # undecodable payload passes through, flagged
    if decoded is None:
        return data, "truncated"  # bomb: cap exceeded, keep compressed bytes
    return decoded, "decoded"


@pandas_udf(_DECODE_RESULT)
def _decode_entity_udf(entity: pd.Series, encoding: pd.Series) -> pd.DataFrame:
    """gzip/deflate entity decoding over one Arrow batch.  Decompression
    of opaque variable-length streams has no columnar/numpy form — the
    zlib call is inherently per-element, but the data crosses the JVM
    boundary once per Arrow batch, not per row."""
    ents, stats = [], []
    for e, enc in zip(entity, encoding):
        if e is None:
            ents.append(None)
            stats.append("identity")
            continue
        data, st = _decode_one(
            bytes(e), (enc or "identity").strip().lower(), DECODE_MAX_BYTES
        )
        ents.append(data)
        stats.append(st)
    return pd.DataFrame({"entity": ents, "status": stats})


def decode_entity(
    df: DataFrame, entity_col: str = "entity", headers_col: str = "response_headers"
) -> DataFrame:
    """P9: the reference's response-decoding chain NoEncoding → Gzip →
    Deflate (CrawlServiceLike.scala:128) as an Arrow-vectorized stage.

    Replaces `entity_col` in place with the decoded bytes, adds a
    `decode_status` column (identity | decoded | error | unsupported |
    truncated), and — on success — REMOVES the Content-Encoding header
    so downstream consumers (the ES export ships response_headers)
    never mistake decoded bytes for still-compressed ones.  Corrupt,
    unsupported, and over-cap (bomb) payloads pass through with their
    original bytes and a non-'decoded' status; the reference instead
    fails the whole response on decode error (CrawlServiceLike.scala:
    128) — callers wanting that semantic filter decode_status.

    This is the stage a real mapInPandas HTTP fetcher plugs in front of
    span parsing; the fetch simulator itself emits spans directly, so
    the wave loop never pays this cost."""
    res = _decode_entity_udf(F.col(entity_col), content_encoding_expr(headers_col))
    df = df.withColumn("_dec", res)
    stripped = F.filter(
        F.col(headers_col),
        lambda h: F.lower(h["name"]) != "content-encoding",
    )
    return (
        df.withColumn(entity_col, F.col("_dec.entity"))
        .withColumn("decode_status", F.col("_dec.status"))
        .withColumn(
            headers_col,
            F.when(F.col("_dec.status") == "decoded", stripped).otherwise(
                F.col(headers_col)
            ),
        )
        .drop("_dec")
    )


def status_filter(fetched: DataFrame) -> DataFrame:
    """F1 StatusCodeFilter (StatusCodeFilter.scala:10-13): keep 2xx+3xx,
    drop 4xx/5xx/unknown."""
    return fetched.where(F.col("status").between(200, 399))
