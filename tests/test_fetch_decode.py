"""P9 — gzip/deflate entity decoding (CrawlServiceLike.scala:128:
`decode(NoEncoding) | decode(Gzip) | decode(Deflate)`).

The reference decodes response entities by Content-Encoding before
handing them to apps; our stage does the same over Arrow batches,
keyed by the case-insensitive header lookup.
"""

from __future__ import annotations

import gzip
import zlib

from pyspark.sql import functions as F

from crawler import fetchsim

HEADER_T = "array<struct<name:string,value:string>>"
ROW_T = f"id int, entity binary, response_headers {HEADER_T}"


def _hdr(name, value):
    return {"name": name, "value": value}


def _decode_rows(spark, rows):
    df = spark.createDataFrame(rows, ROW_T)
    out = fetchsim.decode_entity(df).orderBy("id").collect()
    return [bytes(r["entity"]) if r["entity"] is not None else None for r in out]


def test_gzip_zlib_raw_deflate_roundtrip(spark):
    body_a = b"<html>" + b"hello crawler " * 50 + b"</html>"
    body_b = b"deflate zlib-wrapped payload" * 20
    body_c = b"raw deflate payload, no zlib header" * 20
    raw = zlib.compressobj(wbits=-15)
    rows = [
        (0, bytearray(gzip.compress(body_a)), [_hdr("Content-Encoding", "gzip")]),
        (1, bytearray(zlib.compress(body_b)), [_hdr("content-encoding", "deflate")]),
        (2, bytearray(raw.compress(body_c) + raw.flush()), [_hdr("CONTENT-ENCODING", "deflate")]),
    ]
    assert _decode_rows(spark, rows) == [body_a, body_b, body_c]


def test_identity_unknown_and_missing_pass_through(spark):
    rows = [
        (0, bytearray(b"plain"), [_hdr("Content-Encoding", "identity")]),
        (1, bytearray(b"brotli-ish"), [_hdr("Content-Encoding", "br")]),  # unsupported coding
        (2, bytearray(b"no header"), []),
        (3, bytearray(b"null headers"), None),
        (4, None, [_hdr("Content-Encoding", "gzip")]),  # null entity stays null
    ]
    assert _decode_rows(spark, rows) == [
        b"plain",
        b"brotli-ish",
        b"no header",
        b"null headers",
        None,
    ]


def test_corrupt_stream_passes_through(spark):
    # a truncated gzip stream must not kill the wave — the row passes
    # through undecoded (the status filter / app decides what to do)
    rows = [(0, bytearray(b"\x1f\x8b garbage"), [_hdr("Content-Encoding", "gzip")])]
    assert _decode_rows(spark, rows) == [b"\x1f\x8b garbage"]


def test_x_gzip_alias_and_gzip_autodetect(spark):
    body = b"x-gzip alias body" * 10
    rows = [
        (0, bytearray(gzip.compress(body)), [_hdr("Content-Encoding", "x-gzip")]),
        # some servers send zlib-wrapped data labeled gzip; wbits=47 handles both
        (1, bytearray(zlib.compress(body)), [_hdr("Content-Encoding", "gzip")]),
    ]
    assert _decode_rows(spark, rows) == [body, body]


def test_content_encoding_expr_case_insensitive(spark):
    df = spark.createDataFrame(
        [(0, None, [_hdr("CoNtEnT-eNcOdInG", "GZIP"), _hdr("Content-Type", "text/html")])],
        ROW_T,
    )
    got = df.select(
        fetchsim.content_encoding_expr("response_headers").alias("enc")
    ).collect()[0]["enc"]
    assert got == "GZIP"


def test_decode_status_and_header_strip(spark):
    """A successful decode strips Content-Encoding from the headers and
    flags decode_status='decoded'; corrupt / unsupported / identity rows
    keep their headers and get the matching status."""
    body = b"<html>ok</html>" * 10
    rows = [
        (0, bytearray(gzip.compress(body)), [_hdr("Content-Encoding", "gzip"), _hdr("Content-Type", "text/html")]),
        (1, bytearray(b"\x1f\x8b garbage"), [_hdr("Content-Encoding", "gzip")]),
        (2, bytearray(b"brotli-ish"), [_hdr("Content-Encoding", "gzip, br")]),
        (3, bytearray(b"plain"), [_hdr("Content-Type", "text/plain")]),
    ]
    df = spark.createDataFrame(rows, ROW_T)
    out = {r["id"]: r for r in fetchsim.decode_entity(df).collect()}
    assert out[0]["decode_status"] == "decoded"
    assert [h["name"] for h in out[0]["response_headers"]] == ["Content-Type"]
    assert bytes(out[0]["entity"]) == body
    assert out[1]["decode_status"] == "error"
    assert [h["name"] for h in out[1]["response_headers"]] == ["Content-Encoding"]
    assert out[2]["decode_status"] == "unsupported"  # multi-coding passthrough
    assert bytes(out[2]["entity"]) == b"brotli-ish"
    assert out[3]["decode_status"] == "identity"


def test_decompression_bomb_capped():
    """ADVICE r2: a tiny gzip payload expanding past the cap must not
    materialize the full output — flagged 'truncated', compressed bytes
    kept.  Exercises the bounded decompressobj loop directly with a
    small cap (the pure function the UDF calls)."""
    from crawler.fetchsim import _decode_one, _inflate_capped

    bomb = gzip.compress(b"\x00" * (8 * 1024 * 1024))  # ~8 KB → 8 MB
    assert _inflate_capped(bomb, 47, 1024 * 1024) is None
    data, status = _decode_one(bomb, "gzip", 1024 * 1024)
    assert status == "truncated" and data == bomb
    # under the cap the same stream decodes fully
    ok, status = _decode_one(bomb, "gzip", 16 * 1024 * 1024)
    assert status == "decoded" and ok == b"\x00" * (8 * 1024 * 1024)


def test_bomb_capped_through_spark(spark):
    """End-to-end: a stream expanding past DECODE_MAX_BYTES survives the
    wave flagged truncated (no executor OOM, entity = compressed bytes)."""
    big = gzip.compress(b"\x00" * (fetchsim.DECODE_MAX_BYTES + (1 << 20)))
    rows = [(0, bytearray(big), [_hdr("Content-Encoding", "gzip")])]
    df = spark.createDataFrame(rows, ROW_T)
    r = fetchsim.decode_entity(df).collect()[0]
    assert r["decode_status"] == "truncated"
    assert bytes(r["entity"]) == big
