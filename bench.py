"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and the crawl-engine wave benchmark
(the BASELINE.json target metric: URLs scheduled+deduped/sec on a
synthetic frontier), then prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "frontier": {"urls": N, "sec": s, "urls_per_sec": r}}

Scaling-efficiency evidence (N vs 4N parallelism) lives in
``BENCH/scaling.py`` → ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _now() -> float:
    return time.perf_counter()


def _cpu_sample() -> tuple[int, int, int, int] | None:
    """(user, sys, steal, total) jiffies from the aggregate /proc/stat
    line.

    Used to annotate each timed rep with how much real CPU the host
    delivered during the window — round-2's driver-vs-ledger throughput
    discrepancy (71.7k vs 306k URLs/s for identical code+config) was
    unadjudicable because the artifact carried no evidence of host
    health.  USER and SYSTEM are reported separately: this host's
    degraded mode under wide load often shows as kernel-time inflation
    (60-76% system, ~0-2% user, low steal — vmstat evidence in
    PLANS.md), which a combined busy% would misread as a healthy run."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:11]]
    except (OSError, ValueError, IndexError):
        return None
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 10)[:8]
    usr = user + nice
    sys_ = system + irq + softirq
    total = usr + sys_ + idle + iowait + steal
    return usr, sys_, steal, total


def _cpu_delta(before, after) -> dict | None:
    if before is None or after is None:
        return None
    usr = after[0] - before[0]
    sys_ = after[1] - before[1]
    steal = after[2] - before[2]
    total = max(1, after[3] - before[3])
    return {
        "busy_pct": round(100.0 * (usr + sys_) / total, 1),
        "user_pct": round(100.0 * usr / total, 1),
        "sys_pct": round(100.0 * sys_ / total, 1),
        "steal_pct": round(100.0 * steal / total, 1),
    }


def run_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, dict]]:
    import __spark_entry__ as entrymod

    # untimed warm-up: JVM codegen + parquet footer/metadata caches —
    # otherwise the first query's number is mostly session start-up
    # (status_filter read 5.0s cold vs 0.3s warm at sf0.1)
    for t in ("events", "documents", "embeddings", "lineitem"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    timings: dict[str, float] = {}
    evidence: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        c0 = _cpu_sample()
        t0 = _now()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution
        timings[name] = round(_now() - t0, 3)
        evidence[name] = {"rows": n, "cpu": _cpu_delta(c0, _cpu_sample())}
        print(f"  {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    return timings, evidence


def run_frontier_wave(spark, n_urls: int, reps: int = 1, knobs: bool = False) -> dict:
    """The target metric: one politeness+dedup wave over a synthetic
    frontier with mega-host skew — URLs scheduled+deduped per second.

    With reps > 1, a small warm-up wave runs first (codegen + Python
    worker spawn excluded from the metric) and the BEST of `reps` timed
    waves is reported — min wall time is the contention-robust estimator
    on this steal-prone host (same methodology as BENCH/scaling.py).

    knobs=True (VERDICT r3 item 5) measures the wave with the feature
    knobs ON, mirroring loop.run_wave's hot-path additions op-for-op:
    link_priority="indegree" (scorer folded into the dedup cogroup),
    robots_ttl_waves (latest-wins window over the robots cache + the
    crawl-delay merge join in schedule_wave), recrawl_ttl_waves (the
    freshness-filtered exact backstop), ingest_sitemaps (declared
    sitemap URLs of 1% of hosts unioned into the candidate stream
    through the same key derivation), and max_urls_per_tpd (the
    per-TPD admission-budget window + quota join over the admitted
    set).  Same input, same shuffle partitioning — so the knobs-on
    scaling-efficiency row in BENCH/BASELINE.md is apples-to-apples
    with the base gate."""
    from pyspark.sql import functions as F

    from crawler import dedup, politeness, schemas, synth
    from crawler.config import CrawlConfig

    cfg = CrawlConfig(
        per_domain_delay_ms=10,
        wave_ms=10_000,  # ~1000 URLs/host budget
        bloom_shards=64,
        bloom_expected_insertions=max(1_000_000, n_urls),
        skew_salt_buckets=32,
        **(
            dict(
                link_priority="indegree",
                fetch_robots=True,
                robots_ttl_waves=5,
                recrawl_ttl_waves=50,
                max_urls_per_tpd=100_000,
                honor_crawl_delay=True,
            )
            if knobs
            else {}
        ),
    )
    # A/B diagnosis hook: BENCH_KNOBS_DISABLE="quota,indegree,robots,
    # sitemaps" drops individual knobs from the knobs-on wave to
    # attribute scaling-efficiency deltas to a specific stage
    disabled = set(
        filter(None, os.environ.get("BENCH_KNOBS_DISABLE", "").split(","))
    )
    if knobs and "quota" in disabled:
        cfg.max_urls_per_tpd = None
    if knobs and "indegree" in disabled:
        cfg.link_priority = "none"
    # host count scales with input so the wave's scheduled set (hosts ×
    # budget) grows with n_urls — otherwise the metric saturates at the
    # politeness cap instead of measuring throughput
    n_hosts = max(2000, n_urls // 500)
    pend = synth.synth_frontier(
        spark, n_urls, n_hosts=n_hosts, mega_share=0.2
    ).persist()
    pend.count()  # materialize the input OUTSIDE the timed window
    host_state = spark.createDataFrame(
        [(t, 0, 0) for t in ["mega.com"] + [f"h{i:06d}.com" for i in range(n_hosts)]],
        schemas.HOST_STATE,
    )
    url_seen = spark.createDataFrame([], schemas.URL_SEEN)
    bloom_df = dedup.empty_bloom_df(spark, cfg)
    wave = 60  # > recrawl_ttl_waves: the freshness filter is in-plan
    sm_cand = None
    if knobs:
        from crawler import robots as robots_mod

        # robots cache under TTL: 1% of hosts cached, TWO rows each
        # (an original + a refetch) so the latest-wins window does real
        # work; half the cached hosts declare a Crawl-delay that the
        # scheduler must merge (stricter-of semantics)
        cached = [f"h{i:06d}.com" for i in range(0, n_hosts, 100)]
        robots = robots_mod.latest(
            spark.createDataFrame(
                [(h, [], 100 if i % 2 == 0 else None, [], 0)
                 for i, h in enumerate(cached)]
                + [(h, [], 100 if i % 2 == 0 else None, [], 3)
                   for i, h in enumerate(cached)],
                schemas.ROBOTS_CACHE,
            )
        )
        # ingest_sitemaps: declared sitemap URLs enter the candidate
        # stream through the same key derivation as extracted links
        sm_cand = dedup.with_url_keys(
            spark.createDataFrame(
                [(f"http://{h}/sitemap.xml", f"robots://{h}", i)
                 for i, h in enumerate(cached)],
                "url string, source_url string, link_pos long",
            ),
            "url",
            cfg,
        ).select(
            "url", "tpd", "host", "url_canon", "url_hash",
            F.lit(0).cast("long").alias("fetch_ms"),
            "source_url",
            F.lit(0).cast("long").alias("src_seq"),
            "link_pos", "h1", "shard_id",
        )
        quota = spark.createDataFrame([], schemas.TPD_QUOTA)
    else:
        robots = spark.createDataFrame([], schemas.ROBOTS_CACHE)

    def one_wave(src) -> tuple[int, float, dict | None]:
        c0 = _cpu_sample()
        t0 = _now()
        scheduled, _blocked = politeness.schedule_wave(src, host_state, robots, cfg, 0)
        cand = scheduled.select(
            "url", "tpd", "host", "url_canon", "url_hash", "fetch_ms",
            F.col("url").alias("source_url"), F.col("seq").alias("src_seq"),
            F.lit(0).cast("long").alias("link_pos"),
            F.hash("url_canon").alias("h1"),
            F.pmod(F.hash("tpd"), F.lit(cfg.bloom_shards)).cast("int").alias("shard_id"),
        )
        if sm_cand is not None:
            cand = cand.unionByName(sm_cand)
        admitted = dedup.dedup_candidates(
            cand, url_seen, bloom_df, cfg,
            wave=wave if knobs else None,
            with_indegree=(cfg.link_priority == "indegree"),
        )
        new = admitted
        if cfg.max_urls_per_tpd is not None:
            # loop.run_wave's guarded admission budget, mirrored: only
            # tpds that can exceed the cap pay the sort+window; the
            # rest anti-join the tiny binding set (see loop.py)
            from pyspark.sql.window import Window

            cap = int(cfg.max_urls_per_tpd)
            binding = (
                new.groupBy("tpd")
                .agg(F.count("*").alias("_wave_cnt"))
                .join(quota, on="tpd", how="left")
                .where(
                    F.col("_wave_cnt") + F.coalesce(F.col("admitted"), F.lit(0))
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
                new.join(binding, on="tpd")
                .withColumn("_adm_rn", F.row_number().over(w_adm))
                .where(F.col("_adm_rn") + F.col("_already") <= F.lit(cap))
                .drop("_adm_rn", "_already")
            )
            new = new.join(
                binding.select("tpd"), on="tpd", how="left_anti"
            ).unionByName(risky)
        n_new = new.count()
        sec = _now() - t0
        cpu = _cpu_delta(c0, _cpu_sample())
        admitted.unpersist()  # the handle dedup_candidates persisted
        return int(n_new), sec, cpu

    if reps > 1:
        one_wave(pend.limit(min(50_000, n_urls)))  # warm-up, untimed
    runs = [one_wave(pend) for _ in range(max(1, reps))]
    pend.unpersist()
    n_new, sec, _ = min(runs, key=lambda r: r[1])
    return {
        "urls": n_new,
        "sec": round(sec, 3),
        "urls_per_sec": round(n_new / sec, 1),
        "reps": max(1, reps),
        "knobs": knobs,
        # full per-rep evidence: a stolen rep shows high steal_pct /
        # low busy_pct next to its inflated wall time, so the best-of
        # headline is auditable instead of taken on faith
        "rep_evidence": [
            {"sec": round(s, 3), "urls_per_sec": round(n / s, 1), "cpu": cpu}
            for n, s, cpu in runs
        ],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    # 8M, not 2M: each wave carries ~2-3s of input-size-independent cost
    # (driver planning, Python-worker spawn, stage barriers), which at a
    # 1.6M-URL input is up to a third of a clean ~5-8s rep — the metric
    # then measures fixed overhead, not the engine (same amortization
    # argument as the scaling-gate input, PLANS.md "Scaling evidence").
    # Measured in one host epoch: 1.6M input → 198k URLs/s clean rep;
    # 8M input → 283k clean rep, and steal-degraded reps stay ≥160k.
    frontier_n = int(os.environ.get("BENCH_FRONTIER_URLS", 8_000_000))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from crawler.session import get_spark

    reps = int(os.environ.get("BENCH_FRONTIER_REPS", 5))

    spark = get_spark("crawler-bench", master=f"local[{cpus}]")
    c_all = _cpu_sample()
    t_all = _now()
    timings, query_evidence = run_queries(spark, sf_dir)
    frontier = run_frontier_wave(spark, frontier_n, reps=reps)
    total = round(_now() - t_all, 3)
    cpu_all = _cpu_delta(c_all, _cpu_sample())

    headline = {
        "metric": "query battery + frontier wave (urls/sec)",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "frontier": {
            "urls": frontier["urls"],
            "sec": frontier["sec"],
            "urls_per_sec": frontier["urls_per_sec"],
            "reps": frontier["reps"],
            # compact per-rep [wall_sec, urls_per_sec, steal_pct]: a
            # stolen rep is self-evident next to its inflated wall
            "rep_evidence": [
                [
                    r["sec"],
                    r["urls_per_sec"],
                    (r["cpu"] or {}).get("steal_pct"),
                ]
                for r in frontier["rep_evidence"]
            ],
        },
        "cpus": cpus,
        "cpu": cpu_all,
    }
    # Full evidence (per-query rows + /proc/stat busy/user/sys/steal
    # deltas, full frontier rep cpu splits) goes to an artifact file +
    # stderr — NOT the final stdout line.  Round 3's line grew to
    # ~8.4 KB with query_evidence inline and overflowed the driver's
    # ~2.3 KB tail capture (BENCH_r03.json parsed: null); the driver
    # contract is ONE compact JSON line as the LAST stdout output.
    full = dict(headline)
    full["frontier"] = frontier
    full["query_evidence"] = query_evidence
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "artifacts")
    try:
        os.makedirs(art_dir, exist_ok=True)
        art = os.path.join(art_dir, f"bench_full_sf{sf}_{int(time.time())}.json")
        with open(art, "w") as f:
            json.dump(full, f, indent=1)
        print(f"full evidence -> {art}", file=sys.stderr)
    except OSError as e:
        print(f"artifact write failed: {e}", file=sys.stderr)
        print(json.dumps(full), file=sys.stderr)

    # guard the driver contract: stay well under the ~2.3 KB capture by
    # progressively shedding optional evidence (all preserved in the
    # artifact file) before ever touching the per-query timings
    def _line():
        return json.dumps(headline, separators=(",", ":"))

    if len(_line()) > 1800:
        headline.pop("cpu", None)
    if len(_line()) > 1800:
        headline["frontier"]["rep_evidence"] = headline["frontier"]["rep_evidence"][:2]
    if len(_line()) > 1800:
        headline["queries"] = {k: round(v, 1) for k, v in timings.items()}
    if len(_line()) > 1800:
        headline["queries"] = {
            k: headline["queries"][k] for k in list(headline["queries"])[:40]
        }
        headline["queries_truncated"] = True
    sys.stdout.flush()
    print(_line())


if __name__ == "__main__":
    main()
