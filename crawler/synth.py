"""Deterministic synthetic fixtures (seed=42, no external data).

1. ``test_server_pages`` — a faithful port of the reference's test HTTP
   server (crawler-lib/src/test/scala/testutils/TestHttpServer.scala:18-44),
   the fixture every reference integration test crawls against:
     /links/1→/links/2→/links/3→∅         (DuplicateFilteringSpec golden)
     /crawl/k→/crawl/k+1 (k<10), /crawl/10→/crawl/1  (ring; SimpleCrawlSpec)
     /status/301 (redirect to /), /status/404, /status/503
     /1../40 flat pages (MultiInstanceSpec), default "OK!"
   Bodies become interleaved span arrays per BASELINE.json input_hint —
   text spans carry the exact anchor markup, media spans interleave.

2. ``multihost_pages`` — a multi-host web graph with Zipf out-degree and
   one mega-host holding ~half the URLs (skew exerciser).

3. ``synth_frontier`` / ``synth_documents`` — JVM-side generators
   (spark.range + expressions, zero Python) for benchmark-scale inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import hashing, schemas, urlnorm

SEED = 42
TEST_HOST = "http://localhost:9090"


def _page(url: str, status: int = 200, location: str | None = None,
          doc_id: str | None = None, content_type: str | None = None) -> dict:
    host = url.split("://")[1].split("/")[0].split(":")[0]
    return {"url": url, "host": host, "status": status,
            "location": location, "doc_id": doc_id,
            "content_type": content_type}


def _doc(doc_id: str, body_html: str, with_media: bool = False) -> dict:
    """Wrap a body in interleaved spans: prose text / media / link text."""
    spans = [
        {"kind": "text", "text": "<html><body>", "media_ref": "", "offset": 0},
    ]
    off = 1
    if with_media:
        spans.append({"kind": "media", "text": "",
                      "media_ref": f"img://{doc_id}/hero.jpg", "offset": off})
        off += 1
    spans.append({"kind": "text", "text": body_html, "media_ref": "", "offset": off})
    spans.append({"kind": "text", "text": "</body></html>", "media_ref": "",
                  "offset": off + 1})
    return {"doc_id": doc_id, "spans": spans}


def test_server_fixture() -> tuple[pd.DataFrame, pd.DataFrame]:
    """(pages, documents_spans) as pandas — the TestHttpServer graph."""
    pages, docs = [], []

    def add(path: str, body: str | None, status: int = 200,
            location: str | None = None, media: bool = False) -> None:
        url = f"{TEST_HOST}{path}"
        doc_id = None
        if body is not None and status == 200:
            doc_id = f"doc:{path}"
            docs.append(_doc(doc_id, body, with_media=media))
        pages.append(_page(url, status, location, doc_id))

    # /links chain (TestHttpServer.scala:19-26)
    add("/links/1", '<a href="/links/2">This is a link</a>')
    add("/links/2", '<a href="/links/3">This is a link</a>')
    add("/links/3", "")
    # /status endpoints (:28-36)
    add("/status/301", None, status=301, location="/")
    add("/status/404", None, status=404)
    add("/status/503", None, status=503)
    # /crawl ring (:37-44)
    for k in range(1, 10):
        add(f"/crawl/{k}", f'<a href="/crawl/{k + 1}">This is the next page</a>',
            media=(k % 3 == 0))
    add("/crawl/10", '<a href="/crawl/1">Go back to the beginning</a>')
    # flat pages /1../40 + default route "OK!" (:45)
    for k in range(1, 41):
        add(f"/{k}", "OK!")
    add("/", "OK!")
    return pd.DataFrame(pages), pd.DataFrame(docs)


def multihost_fixture(
    n_hosts: int = 50, pages_per_host: int = 20, mega_host_pages: int = 500,
    seed: int = SEED,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Multi-host graph: h000..h{n}.example.com with Zipf out-degree,
    plus mega.example.com holding a large page block (skew tier)."""
    rng = np.random.RandomState(seed)
    hosts = [f"h{i:03d}.com" for i in range(n_hosts)] + ["mega.com"]
    counts = [pages_per_host] * n_hosts + [mega_host_pages]
    all_urls = [
        f"http://{h}/p/{k}" for h, c in zip(hosts, counts) for k in range(c)
    ]
    pages, docs = [], []
    for h, c in zip(hosts, counts):
        for k in range(c):
            url = f"http://{h}/p/{k}"
            deg = min(int(rng.zipf(2.0)), 8)
            targets = []
            if k + 1 < c:
                targets.append(f"/p/{k + 1}")  # intra-host chain
            for _ in range(deg):
                targets.append(all_urls[rng.randint(0, len(all_urls))])
            body = " ".join(
                f'<a href="{t}">link {i}</a>' for i, t in enumerate(targets)
            )
            doc_id = f"doc:{h}/p/{k}"
            docs.append(_doc(doc_id, body, with_media=(k % 5 == 0)))
            pages.append(_page(url, 200, None, doc_id))
    # robots.txt pages (plain-text single span): the mega-host disallows
    # the /p/1 prefix (so /p/1, /p/10.., /p/1xx are all blocked when
    # fetch_robots is on); h001 disallows /p/3 AND declares a fractional
    # Crawl-delay (0.2 s) so the e2e oracle-equivalence suite exercises
    # the crawl-delay scheduling path, not just rule blocking
    for h, body in (
        ("mega.com", "User-agent: *\nDisallow: /p/1"),
        ("h001.com", "User-agent: *\nDisallow: /p/3\nCrawl-delay: 0.2"),
    ):
        doc_id = f"doc:{h}/robots.txt"
        docs.append(
            {
                "doc_id": doc_id,
                "spans": [
                    {
                        "kind": "text",
                        "text": body,
                        "media_ref": "",
                        "offset": 0,
                    }
                ],
            }
        )
        pages.append(_page(f"http://{h}/robots.txt", 200, None, doc_id))
    return pd.DataFrame(pages), pd.DataFrame(docs)


def pages_df(spark: SparkSession, pages: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(pages, schema=schemas.PAGES)


def documents_df(spark: SparkSession, docs: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(docs, schema=schemas.DOCUMENTS_SPANS)


def md5_image_blobs(refs: DataFrame) -> DataFrame:
    """SIMG payloads whose pixels are the md5 stream of the ref —
    deterministic AND reproducible in SQL (DuckDB md5 of the same
    strings), so the real numpy decode stage can be value-checked by an
    oracle end-to-end:

      w = 8 + md5(ref)[0] % 25,  h = 8 + md5(ref)[1] % 25,  c = 3
      pixels[16k..16k+15] = md5(ref ':' k)

    Input: DataFrame(media_ref string) → (media_ref, blob binary)."""
    import hashlib

    from .textops import SIMG_MAGIC

    def gen(batches):
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                d = hashlib.md5(ref.encode()).digest()
                w, h, c = 8 + d[0] % 25, 8 + d[1] % 25, 3
                n_px = w * h * c
                chunks = []
                for k in range(-(-n_px // 16)):
                    chunks.append(hashlib.md5(f"{ref}:{k}".encode()).digest())
                px = b"".join(chunks)[:n_px]
                blob = (
                    SIMG_MAGIC
                    + w.to_bytes(2, "big")
                    + h.to_bytes(2, "big")
                    + bytes([c])
                    + px
                )
                rows.append((ref, blob))
            yield pd.DataFrame(rows, columns=["media_ref", "blob"])

    return refs.select("media_ref").mapInPandas(
        gen, schema="media_ref string, blob binary"
    )


def md5_video_blobs(refs: DataFrame) -> DataFrame:
    """SVID payloads whose frame pixels are the md5 stream of the ref —
    deterministic AND reproducible in SQL, so the frame-sampling stage
    (textops.frame_sample_features) can be value-checked by a DuckDB
    oracle end-to-end (the video twin of md5_image_blobs):

      n_frames = 4 + md5(ref)[0] % 13   (4..16)
      w        = 4 + md5(ref)[1] % 9    (4..12)
      h        = 4 + md5(ref)[2] % 9
      c        = 3
      pixels[16k..16k+15] = md5(ref ':' k)   (one global stream over
                                              ALL frames, row-major)

    Input: DataFrame(media_ref string) → (media_ref, blob binary)."""
    import hashlib

    from .textops import SVID_MAGIC

    def gen(batches):
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                d = hashlib.md5(ref.encode()).digest()
                nf, w, h, c = 4 + d[0] % 13, 4 + d[1] % 9, 4 + d[2] % 9, 3
                n_px = nf * w * h * c
                chunks = [
                    hashlib.md5(f"{ref}:{k}".encode()).digest()
                    for k in range(-(-n_px // 16))
                ]
                px = b"".join(chunks)[:n_px]
                blob = (
                    SVID_MAGIC
                    + nf.to_bytes(2, "big")
                    + w.to_bytes(2, "big")
                    + h.to_bytes(2, "big")
                    + bytes([c])
                    + px
                )
                rows.append((ref, blob))
            yield pd.DataFrame(rows, columns=["media_ref", "blob"])

    return refs.select("media_ref").mapInPandas(
        gen, schema="media_ref string, blob binary"
    )


def synth_media_blobs(spark: SparkSession, n: int, seed: int = SEED) -> DataFrame:
    """Deterministic binary image payloads in the SIMG raw container
    (textops.SIMG_MAGIC): header + w·h·c uint8 pixels.  Stands in for
    the crawl's fetched media bytes so the decode stage
    (textops.media_decode_features) exercises real numpy parsing over a
    real binary column."""
    import numpy as np

    from .textops import SIMG_MAGIC

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.RandomState(seed + int(i))
                w, h, c = int(rng.randint(4, 33)), int(rng.randint(4, 33)), 3
                px = rng.randint(0, 256, size=w * h * c, dtype=np.uint8)
                blob = (
                    SIMG_MAGIC
                    + int(w).to_bytes(2, "big")
                    + int(h).to_bytes(2, "big")
                    + bytes([c])
                    + px.tobytes()
                )
                rows.append((f"img://doc/{int(i)}", blob))
            yield pd.DataFrame(rows, columns=["media_ref", "blob"])

    return spark.range(n).mapInPandas(gen, schema="media_ref string, blob binary")


# ------------------------------------------------------- benchmark scale


def synth_frontier(
    spark: SparkSession, n_urls: int, n_hosts: int = 1000,
    mega_share: float = 0.3, wave_added: int = 0,
) -> DataFrame:
    """JVM-side synthetic frontier (FIXTURES.md §3) — spark.range, no
    Python.  A `mega_share` fraction of rows lands on one mega-host to
    exercise skew handling; the rest spreads uniformly over n_hosts."""
    r = spark.range(n_urls)  # id 0..n-1, parallel
    is_mega = F.pmod(F.col("id"), F.lit(1000)) < int(mega_share * 1000)
    host = F.when(is_mega, F.lit("mega.com")).otherwise(
        F.concat(
            F.lit("h"),
            F.lpad(F.pmod(F.hash(F.col("id")), F.lit(n_hosts)).cast("string"), 6, "0"),
            F.lit(".com"),
        )
    )
    url = F.concat(F.lit("http://"), host, F.lit("/p/"), F.col("id"))
    from .frontier import request_body_cols

    return r.select(
        url.alias("url"),
        url.alias("url_canon"),
        hashing.h2_expr(url).alias("url_hash"),
        host.alias("host"),
        urlnorm.tpd_expr(host).alias("tpd"),
        F.lit("GET").alias("method"),
        *request_body_cols(),
        F.array().cast("array<string>").alias("provenance"),
        F.lit(0.0).alias("priority"),
        F.col("id").alias("seq"),
        F.lit(0).alias("not_before_wave"),
        F.lit(wave_added).cast("int").alias("wave_added"),
    )


def synth_documents(
    spark: SparkSession, n_docs: int, links_per_doc: int = 4, n_hosts: int = 1000,
) -> DataFrame:
    """JVM-side interleaved-span documents for extraction benchmarks:
    text span with `links_per_doc` anchors + one media span per 5 docs."""
    r = spark.range(n_docs)
    host = F.concat(
        F.lit("h"),
        F.lpad(F.pmod(F.hash(F.col("id")), F.lit(n_hosts)).cast("string"), 6, "0"),
        F.lit(".com"),
    )
    anchors = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit('<a href="http://'),
                host,
                F.lit("/p/"),
                F.pmod(F.hash(F.col("id") + F.lit(i * 7919)), F.lit(1 << 20)),
                F.lit(f'">link {i}</a> lorem ipsum dolor'),
            )
            for i in range(links_per_doc)
        ],
    )
    text_span = F.struct(
        F.lit("text").alias("kind"),
        anchors.alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    media_span = F.struct(
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        F.concat(F.lit("img://doc/"), F.col("id")).alias("media_ref"),
        F.lit(1).alias("offset"),
    )
    spans = F.when(
        F.pmod(F.col("id"), F.lit(5)) == 0, F.array(text_span, media_span)
    ).otherwise(F.array(text_span))
    return r.select(
        F.concat(F.lit("doc:"), F.col("id")).alias("doc_id"),
        spans.alias("spans"),
        F.concat(F.lit("http://"), host, F.lit("/p/"), F.col("id")).alias("url"),
        urlnorm.tpd_expr(host).alias("tpd"),
    )
