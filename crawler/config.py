"""Crawl configuration.

Mirrors the reference's Typesafe config surface
(crawler-backend/src/main/resources/application.conf:17-24,
crawler-backend/src/main/scala/Config.scala:16-25) plus the knobs our
Spark execution model adds (wave budget, bloom sharding, skew salting).

Defaults follow the reference: perDomainDelay=1500ms (prod) / 100ms
(test profile, crawler-test/src/test/resources/application.conf:10),
bloom 1e6 insertions @ fpp 1e-4 (DuplicateFilter.scala:17), schedule
eviction after 100 consecutive empty polls (Frontier.scala:35).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass
class CrawlConfig:
    # --- politeness (reference semantics) ---
    per_domain_delay_ms: int = 1500
    #: per-TPD overrides, e.g. {"linkedin.com": 1000} (application.conf:22-24)
    domain_delays: dict[str, int] = field(default_factory=dict)
    #: cancel a TPD's schedule after this many consecutive empty polls
    #: (FrontierThrottler.scala:78, instantiated with 100 at Frontier.scala:35)
    schedule_timeout_empty_polls: int = 100

    # --- logical clock (replaces the reference's wall-clock timers) ---
    #: one wave spans this many logical milliseconds; a host with delay d
    #: may fetch at most ceil(wave_ms / d) URLs per wave, FIFO.  With
    #: wave_ms == delay this is exactly the reference's 1-per-tick.
    wave_ms: int = 1500

    # --- URL-seen (reference bloom defaults) ---
    bloom_expected_insertions: int = 1_000_000
    bloom_fpp: float = 1e-4
    #: shard count for the distributed bloom; shards are co-partitioned
    #: with the frontier by pmod(murmur3(tpd), n_shards).  Scale knob:
    #: at 1e10 URLs raise to ~4096 so each blob stays ~6 MB.
    bloom_shards: int = 64
    #: cuckoo-filter tier (deletable entries) per-shard slot count
    cuckoo_slots_per_shard: int = 65536
    #: data files per bloom snapshot (explicit repartition — AQE must not
    #: merge shards into one file or the incremental keyed commit loses
    #: its rewrite granularity).  ~shards/bloom_file_buckets shards per
    #: file = the rewrite amplification of one changed shard; at the
    #: 4096-shard scale knob raise to ~256 (16 shards ≈ 100 MB per file)
    bloom_file_buckets: int = 16

    # --- dedup wiring (example-app/Main.scala:32,59) ---
    #: pre-seed URL-seen with the seed list (SimpleCrawlSpec.scala:49-50)
    seed_url_seen: bool = True
    #: RequestExtractor(internalOnly): keep content links only when
    #: tpd(dest) == tpd(src) (RequestExtractor.scala:71-81)
    same_tpd_only: bool = False
    #: StatusCodeFilter before extraction (example-app/Main.scala:58)
    status_filter: bool = True

    # --- robots.txt (north_rule; not in the reference) ---
    #: fetch + cache http://host/robots.txt for hosts newly seen in the
    #: frontier (out-of-band of the politeness budget); disallowed URLs
    #: are dropped at scheduling time
    fetch_robots: bool = False
    #: product token matched against User-agent group names (RFC 9309);
    #: the most specific matching group's rules are cached per host
    user_agent: str = "sparkcrawler"
    #: honor robots Crawl-delay: the per-TPD interval becomes the
    #: stricter of the configured delay and the max Crawl-delay ever
    #: declared by any of the TPD's cached hosts
    honor_crawl_delay: bool = True
    #: cap on a declared Crawl-delay — a hostile 'Crawl-delay: 86400'
    #: must not park the TPD's queue for a day
    robots_max_delay_ms: int = 60_000
    #: robots cache TTL in waves (None = cache forever, reference-free
    #: default).  A host's cache row older than this is STALE: the host
    #: is re-fetched the next wave it has pending rows, the fresh row
    #: supersedes (latest-wins read view — the cache table itself stays
    #: append-only).  Real-web semantics: RFC 9309 §2.4 allows caching
    #: "up to 24 hours"; rule changes must be re-honored.
    robots_ttl_waves: int | None = None
    #: sitemap ingestion (seed discovery; requires fetch_robots).  When
    #: on: (a) Sitemap URLs declared by a host's robots.txt enter the
    #: frontier the wave the robots entry is cached, through the same
    #: admission path as extracted links (canonicalize → deny/depth
    #: gates → URL-seen dedup), with source_url "robots://<host>",
    #: fetch_ms = wave start (robots fetches are out-of-band), seq 0,
    #: link_pos = declaration order; (b) fetched documents that look
    #: like sitemaps (<urlset / <sitemapindex) additionally yield their
    #: <loc> entries as links (absolute URLs only, per sitemaps.org).
    ingest_sitemaps: bool = False

    # --- server-error cooldown (north_rule extension; off = reference
    #     parity).  When set, a wave in which a TPD answered any status
    #     in `error_statuses` (rate-limit / overload signals) pushes
    #     that TPD's next_allowed to at least last_errored_fetch_ms +
    #     error_cooldown_ms — the crawl backs off a struggling server
    #     instead of hammering it at the configured cadence.
    error_cooldown_ms: int | None = None
    error_statuses: tuple = (429, 503)

    # --- termination (TerminationSink.scala:28, Main.scala:37) ---
    max_fetched: int | None = None
    max_waves: int = 1000

    # --- provenance (Requests.scala:62-65) ---
    max_provenance: int = 10

    # --- frontier admission controls (north_rule extensions; both off
    #     by default = reference parity).  Applied at EXTRACTION time,
    #     before URL-seen admission, so a link dropped here can still
    #     be admitted later via a shallower / non-denied path. ---
    #: drop extracted links deeper than this many hops from a seed
    #: (seed = depth 0).  Depth is measured as the provenance-chain
    #: length, so it must stay ≤ max_provenance (the chain is truncated
    #: beyond that — validated at construction).
    max_depth: int | None = None
    #: drop extracted links whose dest URL matches ANY of these regexes
    #: (unanchored find).  Keep patterns inside the Java-regex ∩
    #: Python-regex common subset — the engine evaluates rlike (Java),
    #: the oracle re.search.  Seeds are never filtered.
    url_deny_patterns: tuple = ()
    #: per-TPD admission budget (crawl quota, Heritrix queue-budget
    #: analog): at most this many crawl-discovered URLs are ever
    #: ADMITTED per registrable domain — the cheapest place to stop a
    #: mega-host from consuming the crawl.  Applied after first-wins
    #: dedup in discovery order (fetch_ms, source_url, src_seq,
    #: link_pos); a dropped link is NOT marked seen (harmlessly
    #: re-considered if re-extracted).  Seeds, streaming intake and
    #: re-seeding bypass it, like the other admission controls.
    max_urls_per_tpd: int | None = None

    # --- frontier scoring (north_rule "score-ordered within partition";
    #     "none" = reference parity: RabbitMQ queues are pure FIFO, so
    #     every crawl-discovered row scores 0.0 and seq decides).
    #     The per-TPD dequeue order is always (priority DESC, seq ASC,
    #     url_canon ASC); this knob decides what priority crawl-
    #     discovered rows carry:
    #       "none"     — 0.0 (FIFO)
    #       "depth"    — -len(provenance chain): shallow pages first
    #                    (pure JVM column arithmetic, zero extra work)
    #       "indegree" — within-wave reference count of the URL: pages
    #                    many links point at are fetched first.  Counted
    #                    INSIDE the bloom-probe cogroup where all
    #                    duplicates of a key already meet — zero extra
    #                    shuffles.
    #     Streaming-intake rows keep their submitted priority either way.
    link_priority: str = "none"

    def __post_init__(self) -> None:
        if self.max_depth is not None and self.max_depth > self.max_provenance:
            raise ValueError(
                f"max_depth={self.max_depth} needs the full provenance chain, "
                f"but max_provenance={self.max_provenance} truncates it"
            )
        if self.link_priority not in ("none", "depth", "indegree"):
            raise ValueError(
                f"link_priority must be none|depth|indegree, got {self.link_priority!r}"
            )
        if self.ingest_sitemaps and not self.fetch_robots:
            raise ValueError(
                "ingest_sitemaps needs fetch_robots=True (sitemap URLs are "
                "discovered from cached robots.txt entries)"
            )
        if self.max_urls_per_tpd is not None and self.max_urls_per_tpd < 1:
            raise ValueError(
                f"max_urls_per_tpd must be ≥ 1, got {self.max_urls_per_tpd}"
            )
        if self.robots_ttl_waves is not None:
            if not self.fetch_robots:
                raise ValueError("robots_ttl_waves needs fetch_robots=True")
            if self.robots_ttl_waves < 1:
                raise ValueError(
                    f"robots_ttl_waves must be ≥ 1, got {self.robots_ttl_waves}"
                )

    # --- skew handling ---
    #: candidate cap per host per wave is ceil(wave_ms/delay); the salted
    #: pre-top-k uses this many salt buckets for mega-hosts
    skew_salt_buckets: int = 32

    # --- frontier compaction (log-structured adds/consumed) ---
    compact_every_waves: int = 8

    # --- recrawl TTL (north_rule: the cuckoo tier holds DELETABLE
    #     url-seen entries; None = seen-forever, reference parity).
    #     A URL admitted at wave w0 is "seen" through wave w0+ttl-1 and
    #     becomes RE-DISCOVERABLE at w0+ttl (links pointing at it
    #     re-admit it; nothing is force-enqueued).  Correctness never
    #     depends on the cuckoo in either direction: the exact backstop
    #     filters url_seen by freshness and tombstone hits never bypass
    #     it (a cuckoo false positive must not double-admit a live key,
    #     ADVICE r3) — tombstones are deletion bookkeeping, and
    #     compaction rebuilds the bloom from live keys so fill and
    #     tombstone space stay bounded by the LIVE set, not by
    #     URLs-ever-seen. ---
    recrawl_ttl_waves: int | None = None
    #: re-inject the original seed list every N waves (None = never).
    #: Seeds bypass the dup filter (DuplicateFilteringSpec semantics),
    #: so with a recrawl TTL this drives freshness: the re-seeded crawl
    #: re-discovers pages whose seen-entries have aged out.
    reseed_every_waves: int | None = None

    # --- snapshot expiry (Iceberg expire_snapshots analog) ---
    #: every N waves, drop manifests/data files below the committed
    #: catalog beyond the last `expire_keep_last` versions per table —
    #: bounds warehouse storage on long crawls (resume only ever needs
    #: the committed snapshot).  0 disables.
    expire_every_waves: int = 16
    expire_keep_last: int = 2

    # --- table snapshot backend ---
    #: "native" = warehouse.py's JSON-manifest tables; "iceberg" =
    #: crawler.icebergio.IcebergTable (REAL Iceberg v2 metadata —
    #: metadata.json + Avro manifests, identity-partitioned keyed
    #: snapshots).  Same version-int API either way; the crawl loop is
    #: backend-agnostic and e2e-tested on both, and snapshot expiry
    #: (expire_every_waves) compacts both backends.
    table_format: str = "native"

    def delay_for(self, tpd: str) -> int:
        return self.domain_delays.get(tpd, self.per_domain_delay_ms)

    def per_wave_budget(self, tpd: str) -> int:
        """Max URLs a TPD may fetch in one wave under the logical clock."""
        d = self.delay_for(tpd)
        return max(1, -(-self.wave_ms // d))  # ceil

    def to_dict(self) -> dict:
        return asdict(self)


#: reference test profile: 1 req / 100 ms
#: (crawler-test/src/test/resources/application.conf:10)
def test_config(**overrides) -> CrawlConfig:
    base = dict(per_domain_delay_ms=100, wave_ms=100)
    base.update(overrides)
    return CrawlConfig(**base)
