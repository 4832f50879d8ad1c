"""Real HTTP fetch stage behind the fetchsim seam (SURVEY.md §2.6 O5).

The reference fetches with async Spray HTTP
(CrawlServiceLike.scala:117-131) and tests against a live local server
(TestHttpServer.scala:18-44).  This module is the real-network
implementation of the seam `crawler/fetchsim.py` documents: a
``mapInPandas`` over the wave's politeness-scheduled batch, emitting the
same FETCHED rows the simulator emits, so `loop.Crawl(fetcher=...)`
swaps it in without touching any other stage.

Execution shape (the 100 TB story):

- The scheduled batch is repartitioned by ``tpd`` so every politeness
  domain's requests land in ONE task; inside the task a thread pool
  runs TPDs concurrently while each TPD's requests run sequentially in
  the scheduler's ``(fetch_ms, seq)`` clock order — sibling hosts of
  one registrable domain never fetch concurrently, because the
  politeness contract (and the scheduler's tick clock) is per TPD.
  Consecutive requests are paced by the schedule's own ``fetch_ms``
  gaps (net of time already spent fetching), floored by
  ``per_host_delay_ms`` — the pacing layer the reference enforces in
  RabbitThrottler, re-enforced at the socket.  Input Arrow batches are
  buffered before grouping (a TPD split across two batches would
  restart its pacing clock), and TPD groups are submitted through a
  sliding window (~2x the pool) with chunked yields, so completed
  response bodies never pile up unbounded inside a wide task.
- Network I/O is inherently per-request: this is the documented
  exception to the no-per-row-Python rule (BASELINE.json input_hint).
  Threads overlap request latency; Arrow bounds JVM crossings to one
  per batch, and no response body crosses as more than bytes once.
- Redirects are NOT followed by the fetcher: a 3xx row carries its
  Location header and the extraction stage turns it into a frontier
  link (extract.py P2), exactly like the reference
  (RequestExtractor.scala:59-63) — auto-following would double-count
  politeness budget and bypass the URL-seen set.
- Entities are decoded with the same bounded gzip/deflate chain as the
  pluggable decode stage (fetchsim._decode_one: bomb-capped, corrupt
  payloads pass through flagged) and bodies are capped at
  ``max_bytes`` while streaming — an adversarial server cannot OOM an
  executor.

The body → interleaved-spans parse is the inverse of the fixture
renderer: text runs become ``kind='text'`` spans and ``<img src>`` tags
become ``kind='media'`` spans with ``media_ref`` = the src value
(schemas.py documents spans as "entity HTML bytes exploded into ordered
text/media spans").  Span SPLIT points are representation, not
semantics: compare span streams with ``normalize_spans`` (merges
adjacent text spans), which is invariant across fetchsim/fetchhttp.
"""

from __future__ import annotations

import http.client
import itertools
import re
import socket
import time
import urllib.error
import urllib.request
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

from . import fetchsim, schemas
from .extract import _ATTR_RE, _STRIP_SCALAR_RE

#: response-body cap (streamed: at most this many bytes are ever read
#: per response, before decode; decode is separately capped by
#: fetchsim.DECODE_MAX_BYTES)
MAX_BODY_BYTES = 16 * 1024 * 1024

#: quote-aware <img> tag scan — same tokenizer-grade shape as
#: extract._A_TAG_RE ('>' inside quoted attr values does not end the tag)
_IMG_TAG_RE = re.compile(r"""(?is)<img(?=[\s/>])((?:"[^"]*"|'[^']*'|[^>])*)>?""")


def _attr_of(attrs: str, name: str) -> str | None:
    """First value of attribute `name` in a tag's attr region (same
    duplicate-attribute / quoting rules as extract._href_of_tag)."""
    for m in _ATTR_RE.finditer(attrs):
        if m.group(1).lower() == name:
            v = m.group(2)
            if v is None:
                return None
            if v[:1] in "\"'":
                v = v[1:-1]
            return v
    return None


def spans_from_html(body: str) -> list[dict]:
    """Explode an HTML body into ordered interleaved text/media spans
    (the input_hint span model).  <img src> boundaries become media
    spans; everything between is one text span.  An <img> without a src
    value stays inline in the surrounding text (it references nothing),
    and an <img> inside a dead region (comment / script / style /
    textarea — the same regions extract.py strips before href matching)
    is NOT a media boundary: a DOM tokenizer never sees it as an
    element, so it stays raw text instead of feeding a phantom
    media_ref downstream."""
    spans: list[dict] = []
    pos = 0
    dead = [(m.start(), m.end()) for m in _STRIP_SCALAR_RE.finditer(body)]
    di = 0

    def _text(t: str) -> None:
        if t:
            spans.append(
                {"kind": "text", "text": t, "media_ref": "", "offset": len(spans)}
            )

    for m in _IMG_TAG_RE.finditer(body):
        while di < len(dead) and dead[di][1] <= m.start():
            di += 1
        if di < len(dead) and dead[di][0] <= m.start() < dead[di][1]:
            continue  # commented-out / scripted img: raw text, not media
        src = _attr_of(m.group(1), "src")
        if not src:
            continue  # stays part of the surrounding text run
        _text(body[pos : m.start()])
        spans.append(
            {"kind": "media", "text": "", "media_ref": src, "offset": len(spans)}
        )
        pos = m.end()
    _text(body[pos:])
    return spans


def normalize_spans(spans) -> list[tuple]:
    """Canonical span stream: adjacent text spans merged, empties
    dropped, offsets positional — the equality fetchsim and fetchhttp
    share (split points differ; the character/media stream must not)."""
    out: list[tuple] = []
    for s in spans or []:
        kind = s["kind"]
        if kind == "text":
            if not s["text"]:
                continue
            if out and out[-1][0] == "text":
                out[-1] = ("text", out[-1][1] + s["text"], "")
                continue
            out.append(("text", s["text"], ""))
        else:
            out.append(("media", "", s["media_ref"]))
    return [(k, t, r, i) for i, (k, t, r) in enumerate(out)]


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None  # 3xx is a terminal response; extraction handles Location


def _read_capped(fp, cap: int) -> bytes:
    """Stream at most `cap` bytes from a response body; the connection
    is dropped past the cap (no full-materialize of an adversarial
    body).  Oversized bodies are truncated at the cap — a 16 MB prefix
    of an HTML page still yields its links; refetching more would spend
    politeness budget on a page that is overwhelmingly not HTML."""
    out = bytearray()
    while len(out) < cap:
        try:
            chunk = fp.read(min(1 << 16, cap - len(out)))
        except http.client.IncompleteRead as e:
            # server closed mid-body (short Content-Length / truncated
            # chunked coding): keep the prefix — same policy as the cap
            out += e.partial
            break
        if not chunk:
            break
        out += chunk
    return bytes(out)


def _rewrite_netloc(url: str, resolve: dict[str, str] | None) -> tuple[str, str]:
    """curl --resolve analog: rewrite host[:port] → address while keeping
    the original Host header (tests serve fixture hosts from an
    ephemeral local port; production passes resolve=None)."""
    if not resolve:
        return url, ""
    m = re.match(r"(?i)^(https?://)([^/]+)(.*)$", url)
    if not m:
        return url, ""
    scheme, netloc, rest = m.groups()
    target = resolve.get(netloc.lower())
    if target is None:
        return url, ""
    return f"{scheme}{target}{rest}", netloc


def _fetch_one(
    row: dict,
    opener,
    *,
    user_agent: str,
    timeout_s: float,
    max_bytes: int,
    resolve: dict[str, str] | None,
) -> dict:
    """One request → one FETCHED row (python dict)."""
    url, host_header = _rewrite_netloc(row["url"], resolve)
    req = urllib.request.Request(url, method=row["method"] or "GET")
    req.add_header("User-Agent", user_agent)
    req.add_header("Accept-Encoding", "gzip, deflate")
    if host_header:
        req.add_header("Host", host_header)
    for h in row.get("req_headers") or []:
        req.add_header(h["name"], h["value"])
    if row.get("req_entity") is not None and req.get_method() not in ("GET", "HEAD"):
        req.data = bytes(row["req_entity"])

    status, headers, body = 0, [], b""
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            status = resp.status
            headers = [
                {"name": k, "value": v} for k, v in resp.headers.items()
            ]
            body = _read_capped(resp, max_bytes)
    except urllib.error.HTTPError as e:  # non-2xx WITH a response
        status = e.code
        headers = [{"name": k, "value": v} for k, v in e.headers.items()]
        try:
            body = _read_capped(e, max_bytes)
        except (OSError, http.client.HTTPException):
            body = b""
    except (
        urllib.error.URLError,
        socket.timeout,
        ConnectionError,
        OSError,
        # malformed responses (IncompleteRead, BadStatusLine, LineTooLong,
        # truncated chunked bodies): one broken server must yield a
        # status-0 row, never crash the task and abort the wave
        http.client.HTTPException,
        ValueError,  # e.g. unparsable port / invalid characters in a URL
    ):
        status = 0  # connection failure — same sentinel as fetchsim

    # bounded content decode (shared chain with the pluggable decode
    # stage): on success the Content-Encoding header is consumed
    enc = next(
        (h["value"] for h in headers if h["name"].lower() == "content-encoding"),
        "identity",
    )
    body, decode_status = fetchsim._decode_one(
        body, (enc or "identity").strip().lower(), fetchsim.DECODE_MAX_BYTES
    )
    if decode_status == "decoded":
        headers = [h for h in headers if h["name"].lower() != "content-encoding"]

    ct = next(
        (h["value"] for h in headers if h["name"].lower() == "content-type"), None
    )
    loc = next(
        (h["value"] for h in headers if h["name"].lower() == "location"), None
    )
    spans = None
    if status > 0:
        if ct is None or ct.split(";")[0].strip().lower().startswith("text/"):
            spans = spans_from_html(body.decode("utf-8", errors="replace"))
        else:
            # opaque binary entity: one media span referencing the URL
            # (typed decode happens downstream, textops media operators)
            spans = [
                {"kind": "media", "text": "", "media_ref": row["url"], "offset": 0}
            ]
    n_bytes = sum(len(s["text"]) + len(s["media_ref"]) for s in spans or [])

    return {
        "wave": None,
        "url": row["url"],
        "url_canon": row["url_canon"],
        "host": row["host"],
        "tpd": row["tpd"],
        "fetch_ms": row["fetch_ms"],
        "seq": row["seq"],
        "method": row["method"],
        "status": int(status),
        "location": loc,
        "doc_id": None,
        "spans": spans,
        "provenance": row["provenance"],
        "req_headers": row.get("req_headers"),
        "req_entity": row.get("req_entity"),
        "response_headers": headers if status > 0 else None,
        "content_type": ct if status > 0 else None,
        "n_bytes": n_bytes,
    }


def _nullable(schema: T.StructType) -> T.StructType:
    return T.StructType([T.StructField(f.name, f.dataType, True) for f in schema])


def http_fetcher(
    *,
    user_agent: str = "crawler-spark",
    timeout_s: float = 10.0,
    max_bytes: int = MAX_BODY_BYTES,
    per_host_delay_ms: int = 0,
    host_threads: int = 16,
    resolve: dict[str, str] | None = None,
):
    """Build a fetcher callable with the fetchsim.fetch signature:
    ``fetch(scheduled, pages, documents) -> FETCHED`` (the web-fixture
    args are accepted and ignored — the network is the fixture).

    Usage: ``Crawl(spark, root, cfg, fetcher=http_fetcher(...))``.
    """

    def fetch(scheduled: DataFrame, pages=None, documents=None) -> DataFrame:
        cols = [
            "url", "url_canon", "host", "tpd", "fetch_ms", "seq",
            "method", "provenance", "req_headers", "req_entity",
        ]
        n_part = max(1, scheduled.sparkSession.sparkContext.defaultParallelism)

        def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            opener = urllib.request.build_opener(_NoRedirect)

            def fetch_tpd(rows: list[dict]) -> list[dict]:
                """One politeness domain, strictly sequential: pace each
                request to the scheduler's fetch_ms gap (net of time the
                previous fetch already consumed), floored by
                per_host_delay_ms."""
                out = []
                prev_ms: int | None = None
                prev_t = 0.0
                for r in rows:
                    if out:
                        gap_ms = float(per_host_delay_ms)
                        if prev_ms is not None and r.get("fetch_ms") is not None:
                            gap_ms = max(gap_ms, float(r["fetch_ms"] - prev_ms))
                        wait_s = gap_ms / 1000.0 - (time.monotonic() - prev_t)
                        if wait_s > 0:
                            time.sleep(wait_s)
                    prev_ms = r.get("fetch_ms")
                    prev_t = time.monotonic()
                    out.append(
                        _fetch_one(
                            r, opener,
                            user_agent=user_agent, timeout_s=timeout_s,
                            max_bytes=max_bytes, resolve=resolve,
                        )
                    )
                return out

            # buffer the task's request rows up-front (requests are a few
            # hundred bytes — bodies are outputs, not inputs): Arrow may
            # split one partition into several input batches, and a host
            # split across two batches would restart its pacing clock
            pdfs = [pdf for pdf in batches if not pdf.empty]
            if not pdfs:
                return
            rows = (
                pd.concat(pdfs, ignore_index=True)
                # wire order within a host = the scheduler's clock, not
                # Arrow arrival order (the pacing claim is per that clock)
                .sort_values(["fetch_ms", "seq"], kind="stable")
                .to_dict("records")
            )
            # sequencing unit = TPD (the politeness domain): sibling
            # hosts of one registrable domain share the scheduler's tick
            # clock and must not fetch concurrently
            by_tpd: dict[str, list[dict]] = {}
            for r in rows:
                by_tpd.setdefault(r["tpd"], []).append(r)

            # sliding submission window + chunked yields: completed
            # response bodies never accumulate past ~2x the thread pool
            # (pool.map would submit every group up-front and buffer all
            # finished bodies until consumed — unbounded on a wide task)
            tpd_iter = iter(by_tpd.values())
            window = max(1, host_threads) * 2
            buf: list[dict] = []
            with ThreadPoolExecutor(max_workers=host_threads) as pool:
                pending = {
                    pool.submit(fetch_tpd, grp)
                    for grp in itertools.islice(tpd_iter, window)
                }
                while pending:
                    done, pending = wait(pending, return_when=FIRST_COMPLETED)
                    for fut in done:
                        buf.extend(fut.result())
                        nxt = next(tpd_iter, None)
                        if nxt is not None:
                            pending.add(pool.submit(fetch_tpd, nxt))
                    if len(buf) >= 256:
                        yield pd.DataFrame(buf)
                        buf = []
            if buf:
                yield pd.DataFrame(buf)

        return (
            scheduled.select(*cols)
            # one task per tpd group: per-host pacing is a correctness
            # property, so a host must never span two concurrent tasks
            .repartition(n_part, "tpd")
            .mapInPandas(run_batches, schema=_nullable(schemas.FETCHED))
        )

    return fetch
