"""Export sinks (SURVEY.md §2.1 S7/S8, §2.3 P8).

ElasticSearch bulk-API projection of fetched documents, matching the
reference's shape (model/ESJsonTransformations.scala:12-41 and
processors/ESRabbitRiverTransformer.scala:22-32):

  {"index": {"_index": <appId>, "_type": "fetch_response", "_id": <uri>}}
  {"timestamp": ..., "request_uri": ..., "request_method": ...,
   "request_headers": [...], "request_provenance": [...],
   "response_status": ..., "response_content_type": ...,
   "response_entity": {"_content_type": ..., "_content": <base64>}}

Differences, by design:
  - timestamp is the logical fetch clock (deterministic), not
    System.currentTimeMillis
  - the entity is the span payload (input_hint) serialized canonically
    then base64'd — the reference base64s the raw HTML bytes
  - null-field pruning (the reference's filterNot JsNull) is Spark
    to_json's default behavior (ignoreNullFields)

Everything is JVM expressions (to_json / base64 / concat) — exporting
10^10 rows is a scan + project, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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


def es_doc_json(fetched: DataFrame) -> F.Column:
    """The document line (ESJsonTransformations shape)."""
    payload = span_payload_expr(F.col("spans"))
    entity = F.when(
        F.coalesce(payload, F.lit("")) != "",
        F.struct(
            F.lit("text/html").alias("_content_type"),
            F.base64(payload.cast("binary")).alias("_content"),
        ),
    )
    return F.to_json(
        F.struct(
            F.col("fetch_ms").alias("timestamp"),
            F.col("url").alias("request_uri"),
            F.lit("GET").alias("request_method"),
            F.array().cast("array<string>").alias("request_headers"),
            F.col("provenance").alias("request_provenance"),
            F.col("status").alias("response_status"),
            F.when(F.col("spans").isNotNull(), F.lit("text/html")).alias(
                "response_content_type"
            ),
            entity.alias("response_entity"),
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
