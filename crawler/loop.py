"""The [DRV] wave loop — the crawl lifecycle (SURVEY.md §3.1).

One *wave* = one batch pass of the reference's steps 2-7:

    frontier snapshot → politeness-filtered fetch batch [applyInPandas]
    → fetch-sim join → status filter → link extraction over spans [AUDF]
    → dedupe vs URL-seen [bloom cogroup + exact anti-join]
    → frontier merge → atomic catalog commit (all tables at once)

Iteration lives on the driver (idiomatic Spark — Catalyst has no
iteration), termination is the TerminationSink predicate over the
accumulated CrawlStats (TerminationSink.scala:9-31: stop when
numFetched ≥ N) plus frontier exhaustion.

Resume exactness (north_rule): every wave reads tables at the versions
named by the LAST catalog commit and stages appends against those same
versions, then publishes one atomic catalog swap.  A kill at any point
leaves either the old commit or the new one — never a mix; orphaned
staged files are invisible.  Pending-frontier size is manifest
arithmetic (adds.rows − consumed.rows), no count job needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import dedup, extract, fetchsim, frontier, lineage, politeness, schemas
from . import robots as robots_mod
from .config import CrawlConfig
from .warehouse import Warehouse

TABLES = {
    "frontier_adds": schemas.FRONTIER,
    "frontier_consumed": schemas.CONSUMED,
    "url_seen": schemas.URL_SEEN,
    "url_seen_bloom": schemas.URL_SEEN_BLOOM,
    "host_state": schemas.HOST_STATE,
    "fetched": schemas.FETCHED,
    "lineage": schemas.LINEAGE,
    "pages": schemas.PAGES,
    "documents_spans": schemas.DOCUMENTS_SPANS,
    "robots_cache": schemas.ROBOTS_CACHE,
    "tpd_quota": schemas.TPD_QUOTA,
}


def _bucket_blobs(df: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Explicitly bucket blob rows into bloom_file_buckets data files by
    shard_id.  User-specified repartition counts are exempt from AQE
    coalescing — without this, AQE can merge every shard into one file
    and the keyed incremental commit degrades to a full rewrite."""
    return df.repartition(cfg.bloom_file_buckets, "shard_id")


@dataclass
class WaveMetrics:
    wave: int
    scheduled: int = 0
    delivered: int = 0
    bytes_fetched: int = 0
    extracted: int = 0
    emitted: int = 0
    robots_blocked: int = 0
    pending_after: int = 0


class Crawl:
    def __init__(
        self, spark: SparkSession, root: str, cfg: CrawlConfig, fetcher=None
    ):
        self.spark = spark
        self.cfg = cfg
        self.wh = Warehouse(root, table_format=cfg.table_format)
        #: the O5 seam: (scheduled, pages, documents) -> FETCHED rows.
        #: default = the network-free join simulator; pass
        #: fetchhttp.http_fetcher(...) to crawl a real HTTP surface
        self.fetcher = fetcher or fetchsim.fetch

    # ------------------------------------------------------------- setup

    def _t(self, name):
        return self.wh.table(name, TABLES[name])

    def _read(self, name) -> DataFrame:
        return self.wh.read_committed(self.spark, name, TABLES[name])

    def init(
        self,
        seeds: list[str],
        pages: DataFrame,
        documents: DataFrame,
        robots: DataFrame | None = None,
    ) -> None:
        """Wave -1: install the web fixture, seeds, empty state; commit."""
        cfg, spark = self.cfg, self.spark
        versions = {
            "pages": self._t("pages").overwrite(pages),
            "documents_spans": self._t("documents_spans").overwrite(documents),
            "frontier_adds": self._t("frontier_adds").overwrite(
                frontier.seeds_df(spark, seeds, cfg)
            ),
            "frontier_consumed": self._t("frontier_consumed").overwrite(
                spark.createDataFrame([], schemas.CONSUMED)
            ),
            "host_state": self._t("host_state").overwrite(
                spark.createDataFrame([], schemas.HOST_STATE)
            ),
            "fetched": self._t("fetched").overwrite(
                spark.createDataFrame([], schemas.FETCHED)
            ),
            "lineage": self._t("lineage").overwrite(
                spark.createDataFrame([], schemas.LINEAGE)
            ),
            "robots_cache": self._t("robots_cache").overwrite(
                robots
                if robots is not None
                else spark.createDataFrame([], schemas.ROBOTS_CACHE)
            ),
            "tpd_quota": self._t("tpd_quota").overwrite(
                spark.createDataFrame([], schemas.TPD_QUOTA)
            ),
        }
        bloom0 = dedup.empty_bloom_df(spark, cfg)
        if cfg.seed_url_seen:
            # the reference seeds its dup filter with the seed list
            # (SimpleCrawlSpec.scala:49-50, example-app/Main.scala:32)
            seed_keys = dedup.with_url_keys(
                frontier.seeds_df(spark, seeds, cfg).select("url"), "url", cfg
            )
            versions["url_seen"] = self._t("url_seen").overwrite(
                seed_keys.select(
                    "url_canon", "url_hash", F.lit(0).cast("int").alias("wave")
                ).dropDuplicates(["url_canon"])
            )
            bloom0 = dedup.update_bloom(
                bloom0, seed_keys.dropDuplicates(["url_canon"]), cfg, -1
            )
        else:
            versions["url_seen"] = self._t("url_seen").overwrite(
                spark.createDataFrame([], schemas.URL_SEEN)
            )
        versions["url_seen_bloom"] = self._t("url_seen_bloom").overwrite_keyed(
            _bucket_blobs(bloom0, cfg), "shard_id"
        )
        self.wh.catalog.commit(
            -1,
            versions,
            config=cfg.to_dict(),
            stats={"fetched": 0, "bytes": 0},
            # the literal seed list rides in the catalog so periodic
            # re-seeding (config.reseed_every_waves) survives resume
            seeds=list(seeds),
        )

    # -------------------------------------------------------------- wave

    def pending_count(self) -> int:
        cat = self.wh.catalog
        return self._t("frontier_adds").rows(
            cat.version_of("frontier_adds")
        ) - self._t("frontier_consumed").rows(cat.version_of("frontier_consumed"))

    def run_wave(self, wave: int) -> WaveMetrics:
        cfg, spark, cat = self.cfg, self.spark, self.wh.catalog
        m = WaveMetrics(wave=wave)

        adds_base = cat.version_of("frontier_adds")  # pinned once: the
        # snapshot read, the reseed staging, the wave's own append and
        # the commit-time intake rebase all reason from THIS committed
        # version — reading it twice could straddle a concurrent intake
        # commit and drop the intake's files from the rebase delta
        adds = self._t("frontier_adds").read(spark, adds_base)
        consumed = self._read("frontier_consumed")

        # ---- periodic re-seeding (config.reseed_every_waves): inject
        # the original seed list again — seeds bypass the dup filter
        # (DuplicateFilteringSpec semantics), so with a recrawl TTL this
        # is the freshness driver that re-discovers an expired graph.
        # Staged now (against the committed base) and folded into this
        # wave's adds; the wave's own append chains on top, and the
        # commit's intake-rebase still diffs from the COMMITTED base, so
        # concurrent intake rows survive unchanged.
        reseed_version = None
        if (
            cfg.reseed_every_waves
            and wave > 0
            and wave % cfg.reseed_every_waves == 0
        ):
            seed_list = cat.state().get("seeds") or []
            if seed_list:
                reseed_rows = frontier.seeds_df(spark, seed_list, cfg, wave=wave)
                reseed_version = self._t("frontier_adds").append(
                    reseed_rows, base_version=adds_base
                )
                adds = adds.unionByName(reseed_rows)
        url_seen = self._read("url_seen")
        host_state = self._read("host_state")
        robots = self._read("robots_cache")
        if cfg.robots_ttl_waves is not None:
            # TTL mode appends one row per host per refetch — collapse
            # to the freshest before any reader (incl. the staleness
            # anti-join: a host is fresh iff its LATEST row is)
            robots = robots_mod.latest(robots)
        pages = self._read("pages")
        documents = self._read("documents_spans")

        pend = frontier.pending(adds, consumed).persist()
        robots_version = cat.version_of("robots_cache")
        new_robots = None
        if cfg.fetch_robots:
            # fetch + cache robots for hosts newly seen in the frontier
            # (out-of-band: robots fetches don't consume politeness
            # budget).  Under robots_ttl_waves a host whose cache row
            # aged out counts as uncached and is re-fetched; the fresh
            # row supersedes via the latest-wins view below.
            fresh_after = (
                wave - cfg.robots_ttl_waves
                if cfg.robots_ttl_waves is not None
                else None
            )
            if self.fetcher is fetchsim.fetch:
                new_robots = robots_mod.refresh_robots(
                    pend, robots, pages, documents, wave,
                    user_agent=cfg.user_agent, fresh_after=fresh_after,
                ).persist()
            else:
                # real fetcher installed → robots.txt goes over the wire
                # through the same O5 seam as page fetches
                new_robots = robots_mod.refresh_robots_via(
                    pend, robots, wave, cfg.user_agent, self.fetcher,
                    fresh_after=fresh_after,
                ).persist()
            to_unpersist = [new_robots]
            if new_robots.count() > 0:
                robots_version = self._t("robots_cache").append(
                    new_robots, base_version=robots_version
                )
                robots = robots.unionByName(new_robots)
                if cfg.robots_ttl_waves is not None:
                    # refetched hosts now carry two rows — every reader
                    # (rule split, crawl-delay agg) takes the freshest
                    robots = robots_mod.latest(robots)
        elif self._t("robots_cache").rows(robots_version) == 0:
            # manifest row-count: skip the robots join when cache is empty
            robots = None
        scheduled, blocked = politeness.schedule_wave(pend, host_state, robots, cfg, wave)
        scheduled = scheduled.persist()
        blocked = blocked.persist()
        m.scheduled = scheduled.count()
        m.robots_blocked = blocked.count()

        # ---- fetch + deliver
        fetched_raw = (
            self.fetcher(scheduled, pages, documents)
            .withColumn("wave", F.lit(wave).cast("int"))
            .persist()
        )
        delivered = fetched_raw.where(F.col("status") > 0)
        if cfg.status_filter:
            delivered = fetchsim.status_filter(delivered)
        delivered = delivered.persist()
        agg = delivered.agg(
            F.count("*").alias("n"), F.coalesce(F.sum("n_bytes"), F.lit(0)).alias("b")
        ).collect()[0]
        m.delivered, m.bytes_fetched = int(agg["n"]), int(agg["b"])

        # ---- extract (P1-P3, F5) with the deterministic stream order key
        links_raw = extract.extract_links(
            delivered,
            same_tpd_only=cfg.same_tpd_only,
            source_cols=("url", "tpd", "provenance", "seq", "fetch_ms"),
            parse_sitemap_locs=cfg.ingest_sitemaps,
        )
        # sitemap ingestion (config.ingest_sitemaps): Sitemap URLs
        # declared by THIS wave's newly-cached robots entries enter the
        # same admission path as extracted links.  source_url is the
        # synthetic "robots://<host>" (it becomes the provenance hop),
        # fetch_ms = wave start (robots fetches are out-of-band of the
        # politeness budget), seq 0, link_pos = declaration order.
        # Cached hosts emitted theirs the wave they were cached, so this
        # never re-admits; the explode is over the tiny new-robots set
        # (scan → project, zero extra shuffles).
        if cfg.ingest_sitemaps and new_robots is not None:
            from . import urlnorm as _urlnorm

            sm = new_robots.select(
                F.col("host"), F.posexplode("sitemaps").alias("_pos", "dest_url")
            ).select(
                F.concat(F.lit("robots://"), F.col("host")).alias("url"),
                _urlnorm.tpd_expr(F.col("host")).alias("tpd"),
                F.array().cast("array<string>").alias("provenance"),
                F.lit(0).cast("long").alias("seq"),
                F.lit(wave * cfg.wave_ms).cast("long").alias("fetch_ms"),
                F.col("dest_url"),
                F.lit("sitemap").alias("link_source"),
                F.col("_pos").cast("long").alias("link_pos"),
            )
            if cfg.same_tpd_only:
                sm = sm.where(
                    F.col("tpd") == extract.tpd_of_url_udf(F.col("dest_url"))
                )
            links_raw = links_raw.unionByName(sm)
        # frontier admission controls (config.max_depth /
        # url_deny_patterns) — BEFORE URL-seen admission, so a dropped
        # link never poisons the seen set against a later shallower /
        # non-denied path; pure JVM predicates fused into the extract
        # project (zero extra shuffles)
        if cfg.max_depth is not None:
            links_raw = links_raw.where(
                F.size("provenance") + 1 <= F.lit(int(cfg.max_depth))
            )
        if cfg.url_deny_patterns:
            deny = None
            for p in cfg.url_deny_patterns:
                c = F.col("dest_url").rlike(p)
                deny = c if deny is None else (deny | c)
            links_raw = links_raw.where(~deny)
        cand = (
            links_raw.withColumnRenamed("url", "source_url")
            .withColumnRenamed("seq", "src_seq")
            .withColumnRenamed("tpd", "src_tpd")
        )
        cand = dedup.with_url_keys(cand, "dest_url", cfg).persist()
        m.extracted = cand.count()

        # ---- manifest file-skipping on the URL-seen bloom scan: shards
        # key on tpd, and a politeness-budgeted wave touches a bounded
        # TPD set, so the wave's candidates hash into a bounded shard
        # set — read ONLY the shard files holding them (the Iceberg
        # partition-pruned-scan analog; at 10^10-URL scale the full
        # bloom state is ~100s of GB and a throttled wave needs a
        # fraction of it).  The distinct-shard collect is bounded at
        # cfg.bloom_shards rows and runs over the persisted candidates.
        # Probe semantics are unchanged: every candidate's shard file is
        # included, and extra co-located shards are inert in the
        # cogroup (no candidates → no output rows).
        t_bloom = self._t("url_seen_bloom")
        base_bloom = cat.version_of("url_seen_bloom")
        cand_shards = [
            r["shard_id"] for r in cand.select("shard_id").distinct().collect()
        ]

        # ---- recrawl TTL: entries whose LATEST admission ages out at
        # this wave get cuckoo tombstones (config.recrawl_ttl_waves).
        # Tombstones are ADVISORY bookkeeping — the probe never lets
        # them bypass the exact backstop (a cuckoo false positive would
        # double-admit a live key, ADVICE r3); re-admission is decided
        # by the backstop's freshness filter.  The anti-join against
        # fresher rows keeps the tombstone state itself clean (a canon
        # with a fresher re-admission is not deleted).  The aged slice
        # is one wave's admissions (small probe side); tombstoning
        # happens BEFORE the re-add fold so a key both expiring and
        # re-admitted this wave ends clean.
        expired_keys, expired_shards = None, []
        if (
            cfg.recrawl_ttl_waves is not None
            and wave - cfg.recrawl_ttl_waves >= 0
        ):
            exp_wave = wave - cfg.recrawl_ttl_waves
            aged = url_seen.where(F.col("wave") == F.lit(exp_wave))
            fresher = url_seen.where(F.col("wave") > F.lit(exp_wave))
            expired_keys = dedup.with_url_keys(
                aged.join(fresher.select("url_canon"), "url_canon", "left_anti")
                .select(F.col("url_canon").alias("url")),
                "url",
                cfg,
            ).select("url_canon", "url_hash", "h1", "shard_id").persist()
            expired_shards = [
                r["shard_id"]
                for r in expired_keys.select("shard_id").distinct().collect()
            ]

        bloom_df = t_bloom.read_pruned(
            self.spark,
            "shard_id",
            sorted(set(cand_shards) | set(expired_shards)),
            version=base_bloom,
        )

        # ---- dedupe vs URL-seen (F2-F4); returns persisted+materialized
        new_links = dedup.dedup_candidates(
            cand, url_seen, bloom_df, cfg, wave=wave,
            with_indegree=(cfg.link_priority == "indegree"),
        )

        # ---- per-TPD admission budget (config.max_urls_per_tpd): rank
        # this wave's admissions per dest TPD in discovery order and cut
        # at (cap − already admitted).  One window keyed tpd over the
        # WAVE's admissions (same O as links_to_frontier's rank) + a
        # left join with the tiny cumulative-quota table.  A dropped
        # link is NOT marked seen — the budget filter runs before every
        # consumer of new_links (url_seen append, bloom update,
        # frontier merge), so over-budget URLs stay re-considerable.
        quota = None
        pre_quota_links = None
        if cfg.max_urls_per_tpd is not None:
            from pyspark.sql.window import Window

            quota = self._read("tpd_quota")
            pre_quota_links = new_links  # persisted by dedup_candidates
            cap = int(cfg.max_urls_per_tpd)
            # Rank ONLY the tpds that can actually exceed their budget.
            # A full row_number window over every admission is a
            # sort-heavy exchange of the whole wave (measured: it alone
            # pulled the knobs-on scaling gate from ~0.84 to 0.79);
            # but a tpd with wave_count + already_admitted <= cap
            # admits everything regardless of rank.  One map-side-
            # combined count per tpd finds the (near-cap, usually tiny)
            # binding set; only those tpds' rows pay the sort+window,
            # the rest pass through on an anti-join against the tiny
            # set (AQE broadcasts it — no forced broadcast).  The
            # admitted SET is identical to the full-window plan.
            binding = (
                new_links.groupBy("tpd")
                .agg(F.count("*").alias("_wave_cnt"))
                .join(quota, on="tpd", how="left")
                .where(
                    F.col("_wave_cnt")
                    + F.coalesce(F.col("admitted"), F.lit(0))
                    > F.lit(cap)
                )
                .select(
                    "tpd",
                    F.coalesce(F.col("admitted"), F.lit(0)).alias("_already"),
                )
            )
            w_adm = Window.partitionBy("tpd").orderBy(
                "fetch_ms", "source_url", "src_seq", "link_pos"
            )
            risky = (
                new_links.join(binding, on="tpd")
                .withColumn("_adm_rn", F.row_number().over(w_adm))
                .where(F.col("_adm_rn") + F.col("_already") <= F.lit(cap))
                .drop("_adm_rn", "_already")
            )
            safe = new_links.join(
                binding.select("tpd"), on="tpd", how="left_anti"
            )
            new_links = safe.unionByName(risky).persist()
        m.emitted = new_links.count()

        # ---- stage all table versions against COMMITTED bases
        base = cat.state()["tables"]
        extra_versions = (
            {"robots_cache": robots_version}
            if robots_version != cat.version_of("robots_cache")
            else {}
        )
        # incremental bloom commit: rewrite only the data files whose
        # shards gained keys; every other shard file carries forward by
        # reference (byte-identical paths in the new manifest).
        # t_bloom/base_bloom were captured at the pruned read above —
        # keys_needing_rewrite MUST run against the same manifest
        # version the probe read, and the rewrite-None fallback (no
        # per-file key metadata) is exactly the case where read_pruned
        # fell back to the FULL snapshot, so the full overwrite below
        # never sees a pruned bloom_df.
        changed_shards = sorted(
            {
                r["shard_id"]
                for r in new_links.select("shard_id").distinct().collect()
            }
            | set(expired_shards)
        )

        def _folded(src, emit):
            # tombstone-first, then add: update_bloom's re-add clears the
            # tombstone of a key expiring AND re-admitted in one wave
            if expired_keys is not None:
                if emit is not None:
                    src = src.where(F.col("shard_id").isin(list(emit)))
                src = dedup.forget_urls(src, expired_keys, cfg, wave)
            return dedup.update_bloom(src, new_links, cfg, wave, emit_shards=emit)

        rewrite = t_bloom.keys_needing_rewrite(base_bloom, changed_shards)
        if rewrite is None:  # no per-file key metadata yet: full rewrite once
            bloom_version = t_bloom.overwrite_keyed(
                _bucket_blobs(_folded(bloom_df, None), cfg), "shard_id"
            )
        else:
            shards_per_file = max(1, cfg.bloom_shards // cfg.bloom_file_buckets)
            bloom_version = t_bloom.replace_keys(
                _folded(bloom_df, rewrite).repartition(
                    max(1, -(-len(rewrite) // shards_per_file)), "shard_id"
                ),
                base_bloom,
                "shard_id",
            )

        new_rows = frontier.links_to_frontier(new_links, cfg, wave)
        versions = {
            "frontier_adds": self._t("frontier_adds").append(
                new_rows,
                base_version=(
                    reseed_version if reseed_version is not None else adds_base
                ),
            ),
            "frontier_consumed": self._t("frontier_consumed").append(
                frontier.consumed_keys(scheduled, wave).unionByName(
                    frontier.consumed_keys(blocked, wave)
                ),
                base_version=base.get("frontier_consumed", 0),
            ),
            "url_seen": self._t("url_seen").append(
                new_links.select(
                    "url_canon", "url_hash", F.lit(wave).cast("int").alias("wave")
                ),
                base_version=base.get("url_seen", 0),
            ),
            "url_seen_bloom": bloom_version,
            "fetched": self._t("fetched").append(
                fetched_raw, base_version=base.get("fetched", 0)
            ),
            "lineage": self._t("lineage").append(
                lineage.wave_lineage(
                    spark, cfg, wave, scheduled, delivered, cand, new_links
                ),
                base_version=base.get("lineage", 0),
            ),
        }
        if quota is not None:
            # cumulative admission counts (tiny table: one row per TPD
            # ever admitted to); overwritten per wave like host_state
            delta = new_links.groupBy("tpd").agg(F.count("*").alias("_d"))
            versions["tpd_quota"] = self._t("tpd_quota").overwrite(
                quota.join(delta, on="tpd", how="full_outer").select(
                    "tpd",
                    (
                        F.coalesce(F.col("admitted"), F.lit(0))
                        + F.coalesce(F.col("_d"), F.lit(0))
                    ).alias("admitted"),
                )
            )

        # pending after this wave = (pend − consumed_this_wave) ∪ new rows
        consumed_now = frontier.consumed_keys(scheduled, wave).unionByName(
            frontier.consumed_keys(blocked, wave)
        )
        pending_after = frontier.pending(pend, consumed_now).unionByName(new_rows)
        errored = None
        if cfg.error_cooldown_ms:
            # server-error cooldown: TPDs that answered a rate-limit /
            # overload status this wave back off (config.error_cooldown_ms)
            errored = (
                fetched_raw.where(
                    F.col("status").isin([int(s) for s in cfg.error_statuses])
                )
                .groupBy("tpd")
                .agg(F.max("fetch_ms").alias("_err_last"))
            )
        versions["host_state"] = self._t("host_state").overwrite(
            politeness.next_host_state(
                host_state, pending_after, scheduled, cfg, wave, errored=errored
            )
        )

        # ---- periodic compaction bounds the anti-join (R8 analog)
        if cfg.compact_every_waves and (wave + 1) % cfg.compact_every_waves == 0:
            versions["frontier_adds"] = self._t("frontier_adds").overwrite(
                self._t("frontier_adds").read(spark, versions["frontier_adds"]).join(
                    self._t("frontier_consumed")
                    .read(spark, versions["frontier_consumed"])
                    .select("url_canon", "wave_added", "seq"),
                    on=["url_canon", "wave_added", "seq"],
                    how="left_anti",
                )
            )
            versions["frontier_consumed"] = self._t("frontier_consumed").overwrite(
                spark.createDataFrame([], schemas.CONSUMED)
            )
            if cfg.recrawl_ttl_waves is not None:
                # TTL compaction: drop aged url_seen rows and REBUILD the
                # bloom from the live keys — bloom fill and tombstone
                # space stay bounded by the live set, not URLs-ever-seen
                live = (
                    self._t("url_seen")
                    .read(spark, versions["url_seen"])
                    .where(F.col("wave") > F.lit(int(wave - cfg.recrawl_ttl_waves)))
                    .persist()
                )
                versions["url_seen"] = self._t("url_seen").overwrite(live)
                live_keys = dedup.with_url_keys(
                    live.select(F.col("url_canon").alias("url")), "url", cfg
                )
                versions["url_seen_bloom"] = t_bloom.overwrite_keyed(
                    _bucket_blobs(
                        dedup.update_bloom(
                            dedup.empty_bloom_df(spark, cfg), live_keys, cfg, wave
                        ),
                        cfg,
                    ),
                    "shard_id",
                )
                live.unpersist()
            if cfg.robots_ttl_waves is not None:
                # robots-cache TTL compaction (VERDICT r3): under
                # robots_ttl_waves the cache is append-only — one row
                # per host per refetch — and every reader pays a
                # latest-wins window over hosts × refetches.  Rewrite
                # to the freshest row per host on the same cadence the
                # other state tables compact, so table growth and the
                # read window stay bounded by the HOST set.  Semantics
                # are unchanged: latest() is exactly the view every
                # reader already applies, and max(fetched_wave) per
                # host survives, so staleness refetch timing is
                # identical.
                robots_version = self._t("robots_cache").overwrite(
                    robots_mod.latest(
                        self._t("robots_cache").read(spark, robots_version)
                    )
                )
                extra_versions["robots_cache"] = robots_version

        # ---- one atomic commit for the whole wave, serialized with the
        # streaming intake: if intake appended to frontier_adds mid-wave,
        # rebase our staged version onto the moved base (manifest
        # arithmetic only — no data rewrite), so neither writer's rows
        # are dropped.  Intake rows carry not_before_wave > wave, so they
        # were not consumable this wave in any case.
        with cat.lock():
            cur_state = cat.state()
            cur_adds = cur_state["tables"].get("frontier_adds", 0)
            if cur_adds != adds_base:
                versions["frontier_adds"] = self._t("frontier_adds").rebase_delta(
                    versions["frontier_adds"], adds_base, cur_adds
                )
            st = cur_state["stats"]
            self.wh.catalog.commit(
                wave,
                {**versions, **extra_versions},
                stats={
                    "fetched": st.get("fetched", 0) + m.delivered,
                    "bytes": st.get("bytes", 0) + m.bytes_fetched,
                },
            )
        # ---- periodic snapshot expiry bounds storage on long crawls
        # (safe vs concurrent intake: expire() keeps every manifest
        # above the committed version, so staged-in-flight appends
        # survive; resume only ever reads the committed snapshot)
        if cfg.expire_every_waves and (wave + 1) % cfg.expire_every_waves == 0:
            self.wh.expire(keep_last=cfg.expire_keep_last)

        m.pending_after = self.pending_count()

        for df in (pend, scheduled, blocked, fetched_raw, delivered, cand, new_links,
                   *([pre_quota_links] if pre_quota_links is not None else []),
                   *([expired_keys] if expired_keys is not None else []),
                   *(to_unpersist if cfg.fetch_robots else [])):
            df.unpersist()
        return m

    # --------------------------------------------------------------- run

    def run(self, quiet: bool = True) -> list[WaveMetrics]:
        """Run waves until frontier exhaustion / termination predicate."""
        cfg = self.cfg
        start = self.wh.catalog.state()["wave"] + 1
        out: list[WaveMetrics] = []
        stall = 0
        for w in range(start, cfg.max_waves):
            stats = self.wh.catalog.state()["stats"]
            if cfg.max_fetched is not None and stats["fetched"] >= cfg.max_fetched:
                break  # TerminationSink predicate
            # with periodic re-seeding an empty frontier is NOT terminal —
            # the next reseed wave repopulates it; run to max_waves /
            # max_fetched instead (oracle mirrors)
            if self.pending_count() <= 0 and not cfg.reseed_every_waves:
                break
            m = self.run_wave(w)
            out.append(m)
            if not quiet:
                print(
                    f"wave={w} scheduled={m.scheduled} delivered={m.delivered} "
                    f"extracted={m.extracted} emitted={m.emitted} pending={m.pending_after}"
                )
            # a wave that schedules nothing and adds nothing only advances
            # the clock; bail if that repeats past every host's delay span
            stall = stall + 1 if (m.scheduled == 0 and m.emitted == 0) else 0
            if cfg.reseed_every_waves:
                stall = 0  # idle gaps between reseeds are expected
            max_delay = max(
                [cfg.per_domain_delay_ms, *cfg.domain_delays.values()]
            )
            if stall > max(2, -(-max_delay // cfg.wave_ms) + 1):
                break
        return out
