"""Export sinks (SURVEY.md §2.1 S7/S8, §2.3 P8).

ElasticSearch bulk-API projection of fetched documents, matching the
reference's shape (model/ESJsonTransformations.scala:12-41 and
processors/ESRabbitRiverTransformer.scala:22-32):

  {"index": {"_index": <appId>, "_type": "fetch_response", "_id": <uri>}}
  {"timestamp": ..., "request_uri": ..., "request_method": ...,
   "request_headers": [["name","value"], ...],
   "request_provenance": [...],
   "request_entity": {"_content": <base64>},
   "response_headers": [["name","value"], ...],
   "response_status": ..., "response_content_type": ...,
   "response_entity": {"_content_type": ..., "_content": <base64>}}

Headers serialize as 2-element arrays (spray-json's tuple encoding of
List[(String,String)]); response_content_type derives from the response
headers case-insensitively (Responses.scala:37-39); request/response
entities are included only when non-empty, wrapped as
EntityWithContentType (the request side carries no content type).

Differences, by design:
  - timestamp is the logical fetch clock (deterministic), not
    System.currentTimeMillis
  - the response entity is the span payload (input_hint) serialized
    canonically then base64'd — the reference base64s the raw HTML bytes
  - null-field pruning (the reference's filterNot JsNull) is Spark
    to_json's default; inside request_entity the absent _content_type is
    omitted rather than serialized as an explicit null

Everything is JVM expressions (to_json / base64 / concat) — exporting
10^10 rows is a scan + project, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .fetchsim import content_type_expr

_HEADER_T = "array<struct<name:string,value:string>>"


def span_payload_expr(spans_col) -> F.Column:
    """Canonical string serialization of the span array (the 'entity')."""
    return F.concat_ws(
        "\x1e",  # record separator — cannot appear in span text fixtures
        F.transform(
            spans_col,
            lambda s: F.concat_ws(
                "\x1f", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
            ),
        ),
    )


def _header_pairs(col) -> F.Column:
    """List[(String,String)] → [["name","value"], ...] (spray-json's
    tuple encoding)."""
    return F.transform(
        F.coalesce(col, F.array().cast(_HEADER_T)),
        lambda h: F.array(h["name"], h["value"]),
    )


def es_doc_json(fetched: DataFrame) -> F.Column:
    """The document line (ESJsonTransformations shape)."""
    payload = span_payload_expr(F.col("spans"))
    content_type = content_type_expr(F.col("response_headers"))
    response_entity = F.when(
        F.coalesce(payload, F.lit("")) != "",
        F.struct(
            content_type.alias("_content_type"),
            F.base64(payload.cast("binary")).alias("_content"),
        ),
    )
    request_entity = F.when(
        F.coalesce(F.length(F.col("req_entity")), F.lit(0)) > 0,
        F.struct(F.base64(F.col("req_entity")).alias("_content")),
    )
    return F.to_json(
        F.struct(
            F.col("fetch_ms").alias("timestamp"),
            F.col("url").alias("request_uri"),
            # the request's actual verb (WrappedHttpRequest.method) — not
            # hardcoded: submitted non-GET requests export faithfully
            F.coalesce(F.col("method"), F.lit("GET")).alias("request_method"),
            _header_pairs(F.col("req_headers")).alias("request_headers"),
            F.col("provenance").alias("request_provenance"),
            request_entity.alias("request_entity"),
            _header_pairs(F.col("response_headers")).alias("response_headers"),
            F.col("status").alias("response_status"),
            content_type.alias("response_content_type"),
            response_entity.alias("response_entity"),
        )
    )


def es_bulk_lines(fetched: DataFrame, app_id: str) -> DataFrame:
    """Fetched rows → ES bulk-API line pairs, routed by TPD
    (CrawlServiceLike.scala:87-94).  One output row per document:
    (tpd, bulk) where bulk = action-line \\n doc-line \\n."""
    action = F.concat(
        F.lit('{"index": {"_index": "' + app_id + '", "_type": "fetch_response", "_id": "'),
        F.col("url"),
        F.lit('"}}'),
    )
    return fetched.select(
        F.col("tpd"),
        F.concat(action, F.lit("\n"), es_doc_json(fetched), F.lit("\n")).alias("bulk"),
    )
