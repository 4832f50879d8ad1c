"""Single-threaded reference-semantics oracle (SURVEY.md §5).

A tiny in-memory crawler implementing EXACTLY the semantics the Spark
engine must reproduce — per-TPD FIFO queues, the discrete politeness
clock, first-wins dedup, deterministic within-wave ordering — used by
the e2e tests to assert per-host crawl order, URL-seen membership and
span-sequence equality (the BASELINE.json correctness gate).

It shares the *scalar* kernels (canonicalize/tpd/extract) with the
engine's UDFs so both sides implement one pinned spec; the golden unit
vectors from the reference's specs (RequestExtractorSpec,
DuplicateFilterSpec, HttpRequestSpec) pin that spec to the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from . import extract, urlnorm
from .config import CrawlConfig


@dataclass
class ORow:
    url: str
    url_canon: str
    tpd: str
    host: str
    priority: float
    seq: int
    not_before_wave: int
    provenance: tuple[str, ...] = ()


@dataclass
class OState:
    next_allowed: int
    empty_polls: int = 0


@dataclass
class OracleResult:
    #: per-host ordered fetch log: host → [(wave, fetch_ms, url), ...]
    order_per_host: dict[str, list[tuple[int, int, str]]] = field(default_factory=dict)
    url_seen: set[str] = field(default_factory=set)
    #: url → span list of the fetched doc (kind, text, media_ref, offset)
    fetched_spans: dict[str, list[tuple]] = field(default_factory=dict)
    delivered: int = 0
    bytes_fetched: int = 0
    robots_blocked: list[str] = field(default_factory=list)
    waves: int = 0


class Oracle:
    def __init__(
        self,
        pages: pd.DataFrame,
        documents: pd.DataFrame,
        cfg: CrawlConfig,
        robots: dict[str, list[str]] | None = None,
        robots_crawl_delay: dict[str, int] | None = None,
        robots_sitemaps: dict[str, list[str]] | None = None,
    ):
        self.cfg = cfg
        self.pages = {
            r.url: (int(r.status), r.location, r.doc_id)
            for r in pages.itertuples()
        }
        self.known_hosts = set(pages["host"])
        self.docs = {r.doc_id: list(r.spans) for r in documents.itertuples()}
        self.robots = dict(robots or {})
        #: host → Crawl-delay ms (None when not declared); mirrors the
        #: crawl_delay_ms column of the engine's robots cache.  A
        #: pre-seeded constructor cache may carry declared values
        #: (engine parity: schedule_wave applies crawl_delay_ms from ANY
        #: cache row, warm caches with fetch_robots=False included)
        self.robots_cd: dict[str, int | None] = {
            h: (robots_crawl_delay or {}).get(h) for h in self.robots
        }
        #: host → declared Sitemap URLs (2xx robots only); mirrors the
        #: sitemaps column of the engine's robots cache
        self.robots_sm: dict[str, list[str]] = {
            h: list((robots_sitemaps or {}).get(h, [])) for h in self.robots
        }
        #: host → wave its cache row was fetched (robots_ttl_waves
        #: mirror; pre-seeded constructor robots count as wave 0)
        self.robots_fw: dict[str, int] = {h: 0 for h in self.robots}

    def _fetch_robots(
        self, host: str, any_url: str | None = None
    ) -> list[tuple[bool, str, bool, str]]:
        """Mirror of robots.refresh_robots: bounded redirect chase, then
        the RFC 9309 classification — 2xx parses our UA group's rules,
        UNREACHABLE (status ≤0 / 5xx) caches complete-disallow,
        everything else (4xx, missing page, a chain still redirecting
        past the budget) caches allow-all ([]).  The robots URL is
        derived from a representative pending URL's AUTHORITY
        (scheme://host[:port]) exactly like robots._robots_requests —
        the bare politeness host would ask the wrong origin on a
        port-bearing or https-only surface."""
        import re as _re

        from . import robots as robots_mod

        m = _re.match(r"^(https?://[^/]+)", any_url or "")
        origin = m.group(1) if m else f"http://{host}"
        url = f"{origin}/robots.txt"
        # every fetch REPLACES the host's cache row (latest-wins under
        # robots_ttl_waves): a refetch that stops being 2xx must also
        # forget the previously declared Crawl-delay / Sitemaps, exactly
        # as the engine's fresh row carries nulls
        self.robots_cd[host] = None
        self.robots_sm[host] = []
        page = self.pages.get(url)
        for _ in range(5):  # same budget as robots._follow_redirects
            if page is None or not (300 <= page[0] < 400) or not page[1]:
                break
            url = robots_mod.py_resolve_redirect(url, page[1])
            page = self.pages.get(url)
        if page is None:
            return []  # unavailable → allow-all
        status = page[0]
        if 200 <= status < 300:
            doc_id = page[2]
            spans = self.docs.get(doc_id, []) if doc_id else []
            text = "\n".join(s["text"] for s in spans if s["kind"] == "text")
            self.robots_cd[host] = robots_mod.py_parse_crawl_delay(
                text, self.cfg.user_agent
            )
            self.robots_sm[host] = robots_mod.py_parse_sitemaps(text)
            return robots_mod.py_parse_rules(text, self.cfg.user_agent)
        if status <= 0 or status >= 500:
            return list(robots_mod.DISALLOW_ALL_PY)  # unreachable → disallow
        return []  # 4xx / residual 3xx → allow-all

    def run(self, seeds: list[str]) -> OracleResult:
        cfg = self.cfg
        res = OracleResult()
        queues: dict[str, list[ORow]] = {}
        state: dict[str, OState] = {}

        def enqueue(row: ORow) -> None:
            queues.setdefault(row.tpd, []).append(row)

        for i, u in enumerate(seeds):
            host = urlnorm.host_of(u)
            enqueue(
                ORow(u, urlnorm.canonicalize(u), urlnorm.tpd_of(u), host, 0.0, i, 0)
            )
        # recrawl TTL mirror (engine: dedup_candidates' freshness filter):
        # last admission wave per canon; an entry admitted at w0 blocks
        # through w0+ttl-1 and is re-admittable from w0+ttl.  With
        # ttl=None the plain ever-seen set applies (reference parity).
        seen_wave: dict[str, int] = {}
        #: per-TPD cumulative admissions (max_urls_per_tpd mirror)
        tpd_admitted: dict[str, int] = {}
        ttl = cfg.recrawl_ttl_waves

        def is_seen(canon: str, w: int) -> bool:
            if ttl is None:
                return canon in res.url_seen
            sw = seen_wave.get(canon)
            return sw is not None and sw > w - ttl

        if cfg.seed_url_seen:
            for u in seeds:
                c = urlnorm.canonicalize(u)
                res.url_seen.add(c)
                seen_wave[c] = 0

        total_delivered = 0
        for w in range(cfg.max_waves):
            if cfg.max_fetched is not None and total_delivered >= cfg.max_fetched:
                break
            # engine mirror: with periodic re-seeding an empty frontier
            # is not terminal (the next reseed repopulates it)
            if not any(queues.values()) and not cfg.reseed_every_waves:
                break
            win_start, win_end = w * cfg.wave_ms, (w + 1) * cfg.wave_ms
            fetch_log: list[tuple[int, ORow]] = []  # (fetch_ms, row)

            # periodic re-seeding mirror (loop.run_wave): same seq
            # arithmetic — (w<<32) + 2^31 + i keeps re-seeds behind the
            # wave's discoveries and off the consumed-log keys
            if cfg.reseed_every_waves and w > 0 and w % cfg.reseed_every_waves == 0:
                for i, u in enumerate(seeds):
                    enqueue(
                        ORow(
                            u,
                            urlnorm.canonicalize(u),
                            urlnorm.tpd_of(u),
                            urlnorm.host_of(u),
                            0.0,
                            (w << 32) + (1 << 31) + i,
                            w,
                        )
                    )

            if cfg.fetch_robots:
                # engine mirror: one fetch per uncached host, robots URL
                # from the lexicographically-min pending URL's authority
                # (robots._robots_requests uses min("url") per host)
                # NB: named rttl — `ttl` is this function's recrawl-TTL
                # binding (the is_seen closure reads it); rebinding it
                # here would silently corrupt URL-seen freshness
                rttl = cfg.robots_ttl_waves

                def _uncached(host: str) -> bool:
                    # TTL mirror (robots._robots_requests fresh_after):
                    # a row with fetched_wave ≤ w - rttl is stale → refetch
                    if host not in self.robots:
                        return True
                    return rttl is not None and self.robots_fw[host] <= w - rttl

                min_url: dict[str, str] = {}
                for rows in queues.values():
                    for r in rows:
                        if _uncached(r.host):
                            cur = min_url.get(r.host)
                            if cur is None or r.url < cur:
                                min_url[r.host] = r.url
                for host, u in min_url.items():
                    self.robots[host] = self._fetch_robots(host, u)
                    self.robots_fw[host] = w
                new_robot_hosts = sorted(min_url)
            else:
                new_robot_hosts = []

            for tpd in sorted(queues):  # per-host independence; sort = determinism
                rows = queues[tpd]
                eligible = [r for r in rows if r.not_before_wave <= w]
                if not eligible:
                    continue
                # robots (applied to every eligible row this wave):
                # longest-match verdict over path+query (mirrors
                # robots.blocked_expr / match_target_expr engine-side)
                from . import robots as robots_mod

                allowed, blocked = [], []
                for r in eligible:
                    rules = self.robots.get(r.host)
                    if rules and robots_mod.py_blocked(
                        rules, robots_mod.py_match_target(r.url)
                    ):
                        blocked.append(r)
                    else:
                        allowed.append(r)
                for r in blocked:
                    rows.remove(r)
                    res.robots_blocked.append(r.url)
                delay = cfg.delay_for(tpd)
                if cfg.honor_crawl_delay:
                    # engine mirror (politeness.schedule_wave gates on
                    # `robots is not None`, i.e. cache presence, NOT
                    # cfg.fetch_robots — a warm pre-seeded cache with
                    # fetch_robots=False still applies its declared
                    # delays): interval is the stricter of config and
                    # the max Crawl-delay ever declared by any CACHED
                    # host of this TPD (capped) — politeness is
                    # durable, not per-wave.  robots_cd is empty when
                    # no cache exists, so this is a no-op exactly when
                    # the engine's robots arg is None
                    cds = [
                        cd
                        for h, cd in self.robots_cd.items()
                        if cd is not None and urlnorm.tpd_of(h) == tpd
                    ]
                    if cds:
                        delay = max(delay, min(max(cds), cfg.robots_max_delay_ms))
                st = state.get(tpd)
                t = max(st.next_allowed, win_start) if st else win_start + delay
                # url_canon breaks (priority, seq) ties — two hosts
                # sharing a TPD can carry equal seq values
                allowed.sort(key=lambda r: (-r.priority, r.seq, r.url_canon))
                emitted = []
                for r in allowed:
                    if t >= win_end:
                        break
                    emitted.append((t, r))
                    t += delay
                for ft, r in emitted:
                    rows.remove(r)
                    fetch_log.append((ft, r))
                if emitted:
                    state[tpd] = OState(t, st.empty_polls if st else 0)

            # fetch + deliver
            delivered_items = []
            err_last: dict[str, int] = {}  # tpd → last errored fetch_ms
            for ft, r in sorted(fetch_log, key=lambda x: (x[0], x[1].url, x[1].seq)):
                page = self.pages.get(r.url)
                if page is not None:
                    status, location, doc_id = page
                    spans = self.docs.get(doc_id, []) if doc_id else []
                elif r.host in self.known_hosts:
                    status, location, doc_id = 200, None, None
                    spans = [{"kind": "text", "text": "OK!", "media_ref": "", "offset": 0}]
                else:
                    status, location, doc_id, spans = 0, None, None, None
                res.order_per_host.setdefault(r.host, []).append((w, ft, r.url))
                if cfg.error_cooldown_ms and status in cfg.error_statuses:
                    err_last[r.tpd] = max(err_last.get(r.tpd, 0), ft)
                if status <= 0:
                    continue
                if self.cfg.status_filter and not (200 <= status < 400):
                    continue
                n_bytes = sum(
                    len(s.get("text") or "") + len(s.get("media_ref") or "")
                    for s in (spans or [])
                )
                res.delivered += 1
                res.bytes_fetched += n_bytes
                total_delivered += 1
                res.fetched_spans[r.url] = [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in (spans or [])
                ]
                delivered_items.append((ft, r, spans, location))

            # extract with the deterministic stream-order key
            candidates = []  # (fetch_ms, source_url, src_seq, link_pos, dest, src_row)
            for ft, r, spans, location in delivered_items:
                for dest, src_kind, pos in extract.py_extract_links(
                    r.url,
                    spans or [],
                    location,
                    self.cfg.same_tpd_only,
                    parse_sitemap_locs=cfg.ingest_sitemaps,
                ):
                    candidates.append((ft, r.url, r.seq, pos, dest, r))
            # sitemap ingestion mirror (loop.run_wave): Sitemap URLs of
            # THIS wave's newly-cached robots entries join the candidate
            # stream — source "robots://<host>", fetch_ms = wave start,
            # seq 0, link_pos = declaration order
            if cfg.ingest_sitemaps:
                for h in new_robot_hosts:
                    src_url = f"robots://{h}"
                    pseudo = ORow(
                        src_url, "", urlnorm.tpd_of(h), h, 0.0, 0, w, ()
                    )
                    for i, smu in enumerate(self.robots_sm.get(h, [])):
                        if cfg.same_tpd_only and urlnorm.tpd_of(
                            smu
                        ) != urlnorm.tpd_of(h):
                            continue
                        candidates.append((win_start, src_url, 0, i, smu, pseudo))
            candidates.sort(key=lambda c: (c[0], c[1], c[2], c[3]))

            # frontier admission controls (engine mirror: loop.run_wave
            # filters links_raw BEFORE URL-seen admission)
            if cfg.max_depth is not None:
                candidates = [
                    c for c in candidates if len(c[5].provenance) + 1 <= cfg.max_depth
                ]
            if cfg.url_deny_patterns:
                import re as _re

                candidates = [
                    c
                    for c in candidates
                    if not any(_re.search(p, c[4]) for p in cfg.url_deny_patterns)
                ]

            # within-wave indegree (engine mirror: bloom_probe counts per
            # url_canon inside the probe cogroup, pre-first-wins) — feeds
            # link_priority="indegree" scoring
            canon_counts: dict[str, int] = {}
            if cfg.link_priority == "indegree":
                for c in candidates:
                    cc = urlnorm.canonicalize(c[4])
                    canon_counts[cc] = canon_counts.get(cc, 0) + 1

            # first-wins dedup vs wave-start URL-seen, then within wave;
            # then the per-TPD admission budget (engine mirror: rank per
            # dest tpd over the first-wins survivors in this same order,
            # cut at cap − already admitted; dropped links NOT marked
            # seen)
            cap = cfg.max_urls_per_tpd
            new_rows: list[tuple] = []
            chosen = set()
            for ft, src_url, src_seq, pos, dest, src in candidates:
                canon = urlnorm.canonicalize(dest)
                if is_seen(canon, w) or canon in chosen:
                    continue
                if cap is not None:
                    dtpd = urlnorm.tpd_of(dest)
                    if tpd_admitted.get(dtpd, 0) >= cap:
                        continue
                    tpd_admitted[dtpd] = tpd_admitted.get(dtpd, 0) + 1
                chosen.add(canon)
                new_rows.append((ft, src_url, src_seq, pos, dest, canon, src))
            res.url_seen |= chosen
            for c in chosen:
                seen_wave[c] = w

            # frontier merge: per-host rank in discovery order
            by_host: dict[str, list] = {}
            for item in new_rows:
                h = urlnorm.host_of(item[4])
                by_host.setdefault(h, []).append(item)
            for h, items in by_host.items():
                items.sort(key=lambda c: (c[0], c[1], c[2], c[3]))
                for rank, (ft, src_url, src_seq, pos, dest, canon, src) in enumerate(
                    items, start=1
                ):
                    prov = (list(src.provenance) + [src.url])[-self.cfg.max_provenance:]
                    # frontier scoring mirror (frontier.links_to_frontier)
                    if cfg.link_priority == "depth":
                        prio = float(-len(prov))
                    elif cfg.link_priority == "indegree":
                        prio = float(canon_counts[canon])
                    else:
                        prio = 0.0
                    enqueue(
                        ORow(
                            dest, canon, urlnorm.tpd_of(dest), h, prio,
                            ((w + 1) << 32) + rank, w + 1, tuple(prov),
                        )
                    )

            # host-state bookkeeping: empty polls + eviction + new schedules
            ticks = lambda tpd: max(1, -(-cfg.wave_ms // cfg.delay_for(tpd)))
            scheduled_tpds = {r.tpd for _, r in fetch_log}
            for tpd in list(state):
                if tpd in scheduled_tpds:
                    continue
                if queues.get(tpd):
                    # queue nonempty, nothing emitted: clock clamp only
                    state[tpd].next_allowed = max(state[tpd].next_allowed, win_start)
                    continue
                state[tpd].empty_polls += ticks(tpd)
                state[tpd].next_allowed = max(state[tpd].next_allowed, win_start)
                if state[tpd].empty_polls >= cfg.schedule_timeout_empty_polls:
                    del state[tpd]  # schedule cancelled
            for tpd, rows in queues.items():
                if rows and tpd not in state:
                    # schedule (re)created this wave, first tick one interval out
                    state[tpd] = OState(win_start + cfg.delay_for(tpd))

            # server-error cooldown (engine mirror: next_host_state's
            # errored push) — errored TPDs always scheduled rows this
            # wave so their state row exists
            for tpd, ft in err_last.items():
                if tpd in state:
                    state[tpd].next_allowed = max(
                        state[tpd].next_allowed, ft + cfg.error_cooldown_ms
                    )

            res.waves = w + 1
            # drop empty queues lazily
            queues = {k: v for k, v in queues.items() if v}
        return res
