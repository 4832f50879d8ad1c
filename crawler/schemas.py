"""Fixed schemas (SURVEY.md §1, FIXTURES.md).

The reference fixes its wire schema with protobuf
(crawler-lib/src/main/resources/protos/models_http.protobuf via
HttpProtos: HttpRequest{method,uri,headers,entity,provenance},
HttpResponse{status_code,headers,entity}, CrawlItem{req,res,appId}).
These StructTypes are the DataFrame equivalents; Snappy+protobuf on the
wire becomes snappy parquet at rest.
"""

from __future__ import annotations

from pyspark.sql import types as T

HEADER = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

#: one interleaved document span (BASELINE.json input_hint; the
#: reference's CrawlItem.res.entity HTML bytes, Responses.scala:29,
#: exploded into ordered text/media spans)
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'media'
        T.StructField("text", T.StringType(), True),  # '' for media
        T.StructField("media_ref", T.StringType(), True),  # '' for text
        T.StructField("offset", T.IntegerType(), False),
    ]
)

#: input_hint table: interleaved text + media documents
DOCUMENTS_SPANS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

#: synthetic web graph — port of the reference's deterministic test
#: HTTP server (crawler-lib/src/test/scala/testutils/TestHttpServer.scala:18-44)
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("location", T.StringType(), True),  # redirect target
        T.StructField("doc_id", T.StringType(), True),  # FK → documents_spans
        #: response Content-Type; None → text/html default for doc pages
        T.StructField("content_type", T.StringType(), True),
    ]
)

#: frontier row = WrappedHttpRequest (Requests.scala:34-39) + scheduling
#: columns.  Partition story: stored bucketed by pmod(hash(tpd), shards);
#: ordered within a host by (priority DESC, seq ASC) — the reference's
#: per-TPD FIFO queues (FrontierThrottler.scala:43) with priority on top.
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(url_canon)
        T.StructField("host", T.StringType(), False),
        T.StructField("tpd", T.StringType(), False),  # politeness key
        T.StructField("method", T.StringType(), False),
        #: WrappedHttpRequest.headers / .entity (Requests.scala:34-39) —
        #: empty for crawl-extracted GETs, carried for submitted requests
        T.StructField("req_headers", T.ArrayType(HEADER), True),
        T.StructField("req_entity", T.BinaryType(), True),
        T.StructField("provenance", T.ArrayType(T.StringType()), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("seq", T.LongType(), False),  # per-host FIFO order
        T.StructField("not_before_wave", T.IntegerType(), False),
        T.StructField("wave_added", T.IntegerType(), False),
    ]
)

#: rows consumed from the frontier (log-structured delete)
CONSUMED = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("wave_added", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("wave_consumed", T.IntegerType(), False),
    ]
)

#: fetched documents — the CrawlItem analog (CrawlItem.scala:4), entity
#: replaced by the span array per input_hint
FETCHED = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("tpd", T.StringType(), False),
        T.StructField("fetch_ms", T.LongType(), False),  # logical clock
        T.StructField("seq", T.LongType(), False),
        #: request verb (models_http.protobuf RequestMethod: GET HEAD
        #: POST PUT DELETE TRACE OPTIONS CONNECT PATCH)
        T.StructField("method", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("location", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN), True),
        T.StructField("provenance", T.ArrayType(T.StringType()), False),
        #: CrawlItem = req + res: the request's headers/entity and the
        #: response headers (Content-Type, Location, ...); content_type
        #: is derived from response_headers case-insensitively
        #: (Responses.scala:37-39)
        T.StructField("req_headers", T.ArrayType(HEADER), True),
        T.StructField("req_entity", T.BinaryType(), True),
        T.StructField("response_headers", T.ArrayType(HEADER), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

#: exact URL-seen backstop (kills bloom false positives; the reference
#: accepts fpp 1e-4 — we must match its *membership set*, so bloom is a
#: prefilter only)
URL_SEEN = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

#: per-TPD cumulative ADMISSION count (config.max_urls_per_tpd crawl
#: quota); empty unless the budget knob is set
TPD_QUOTA = T.StructType(
    [
        T.StructField("tpd", T.StringType(), False),
        T.StructField("admitted", T.LongType(), False),
    ]
)

#: sharded bloom + cuckoo blobs (DuplicateFilter.scala:17,51 semantics,
#: distributed); one row per shard, shard_id = pmod(murmur3(tpd), n)
URL_SEEN_BLOOM = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("bloom", T.BinaryType(), False),
        T.StructField("cuckoo", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

#: per-TPD politeness state (the RabbitThrottler schedule map,
#: RabbitThrottler.scala:59-66 / FrontierThrottler.scala:76-82)
HOST_STATE = T.StructType(
    [
        T.StructField("tpd", T.StringType(), False),
        T.StructField("next_allowed_ms", T.LongType(), False),
        T.StructField("empty_waves", T.IntegerType(), False),
    ]
)

HOST_CONFIG = T.StructType(
    [
        T.StructField("tpd", T.StringType(), False),
        T.StructField("delay_ms", T.IntegerType(), False),
    ]
)

ROBOTS_CACHE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        # compiled RFC-9309 rules of the group matching our UA (see
        # robots.parse_rules_expr); empty = no restrictions / negative
        T.StructField(
            "rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("allow", T.BooleanType(), False),
                        T.StructField("pattern", T.StringType(), False),
                        T.StructField("wild", T.BooleanType(), False),
                        T.StructField("re", T.StringType(), False),
                    ]
                )
            ),
            False,
        ),
        # Crawl-delay of the group matching our UA, in ms (null = not
        # declared / negative-cached).  Non-RFC-9309 but widely honored
        # (Bing/Yandex); the scheduler takes the stricter of this and
        # the configured per-domain delay, capped (config.robots_max_delay_ms).
        T.StructField("crawl_delay_ms", T.IntegerType(), True),
        # Sitemap URLs declared by the host (sitemaps.org protocol;
        # global lines, group-independent) — a seed-discovery surface;
        # auto-enqueued through the shared admission path only when
        # config.ingest_sitemaps is set, otherwise left to tooling.
        T.StructField("sitemaps", T.ArrayType(T.StringType()), False),
        T.StructField("fetched_wave", T.IntegerType(), False),
    ]
)

#: per-wave per-partition lineage (north_rule: resumable from checkpoint
#: with per-partition lineage + metrics); CrawlStats contract from
#: processors/CrawlStats.scala:6-14
LINEAGE = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("urls_scheduled", T.LongType(), False),
        T.StructField("urls_fetched", T.LongType(), False),
        T.StructField("urls_extracted", T.LongType(), False),
        T.StructField("urls_deduped", T.LongType(), False),
        T.StructField("urls_emitted", T.LongType(), False),
        T.StructField("bytes_fetched", T.LongType(), False),
        T.StructField("committed", T.BooleanType(), False),
    ]
)

#: extracted link rows (LinkExtraction, RequestExtractor.scala:12-18)
LINKS = T.StructType(
    [
        T.StructField("dest_url", T.StringType(), False),
        T.StructField("link_source", T.StringType(), False),  # 'content'|'location'
        T.StructField("source_url", T.StringType(), False),
    ]
)
