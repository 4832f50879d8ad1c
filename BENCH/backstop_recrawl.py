"""Recrawl-heavy backstop bench (VERDICT r4 item 5).

dedup.py's tombstone-soundness fix (r4) routes every bloom-positive
candidate — including tombstoned/aged keys — through the exact
backstop; the docstring claims the cost stays bounded between
compactions because the freshness predicate pushes into the url_seen
scan: the backstop's build side is live-keys × TTL-window, NOT the
ever-growing url_seen log.  This script turns that claim into a
recorded number at the scaling-gate input.

Worst-case recrawl pressure: every wave re-presents the ENTIRE 12.8M
corpus as candidates.  recrawl_ttl_waves is tight (2) so each wave ages
out the slice admitted 2 waves ago (tombstoned via forget_urls, exactly
the loop's flow) and re-admits it; compaction cadence is at its widest
(none until the final wave).  Per wave we record:

  cand          candidates entering dedup (constant 12.8M)
  maybe         bloom-positive rows → backstop probe side
  seen_total    url_seen log rows (grows ~12.8M/wave — the unbounded
                thing the backstop must NOT scan)
  seen_fresh    url_seen rows inside the TTL window = the backstop's
                actual build side (bounded: live × TTL)
  admitted      re-admitted rows (the aged slice)
  sec           wall time of the dedup_candidates call

PASS = seen_fresh and sec plateau from wave 3 on while seen_total keeps
climbing; the final compaction wave (url_seen rewritten to live rows,
bloom rebuilt) drops seen_total back to ~12.8M.

Run:  python BENCH/backstop_recrawl.py [n_urls] [waves]   (12.8M, 8)
One JSON line; full per-wave rows -> BENCH/artifacts/.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 12_800_000
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from pyspark.sql import functions as F

    from crawler import dedup, synth
    from crawler.config import CrawlConfig
    from crawler.session import get_spark

    import bench

    cfg = CrawlConfig(
        bloom_shards=64,
        bloom_expected_insertions=max(1_000_000, n_urls),
        recrawl_ttl_waves=2,
    )
    spark = get_spark("backstop-recrawl-bench", master=f"local[{cpus}]")

    pend = synth.synth_frontier(spark, n_urls, n_hosts=max(2000, n_urls // 500))
    cand0 = pend.select(
        "url", "tpd", "host", "url_canon", "url_hash",
        F.lit(0).cast("long").alias("fetch_ms"),
        F.col("url").alias("source_url"), F.col("seq").alias("src_seq"),
        F.lit(0).cast("long").alias("link_pos"),
        F.hash("url_canon").alias("h1"),
        F.pmod(F.hash("tpd"), F.lit(cfg.bloom_shards)).cast("int").alias("shard_id"),
    ).persist()
    cand0.count()

    from crawler import schemas

    url_seen = spark.createDataFrame([], schemas.URL_SEEN)
    bloom_df = dedup.empty_bloom_df(spark, cfg)
    rows = []
    for wave in range(n_waves):
        # the loop's expiry flow: tombstone keys whose url_seen entry
        # ages out this wave (advisory; they still hit the backstop)
        if cfg.recrawl_ttl_waves is not None and wave > 0:
            aged = (
                url_seen.groupBy("url_canon")
                .agg(F.max("wave").alias("wave"), F.first("url_hash").alias("url_hash"))
                .where(F.col("wave") <= F.lit(wave - cfg.recrawl_ttl_waves))
                .join(
                    cand0.select("url_canon", "shard_id").distinct(),
                    on="url_canon",
                )
                .select("shard_id", "url_hash")
            )
            bloom_df = dedup.forget_urls(bloom_df, aged, cfg, wave).localCheckpoint()

        c0 = bench._cpu_sample()
        t0 = time.monotonic()
        admitted = dedup.dedup_candidates(
            cand0, url_seen, bloom_df, cfg, wave=wave
        )
        n_admitted = admitted.count()
        sec = time.monotonic() - t0
        cpu = bench._cpu_delta(c0, bench._cpu_sample())

        # measurement (untimed): the backstop's two input sizes
        fresh_pred = F.col("wave") > F.lit(int(wave - cfg.recrawl_ttl_waves))
        seen_total = url_seen.count()
        seen_fresh = url_seen.where(fresh_pred).count()
        maybe = (
            dedup.bloom_probe(cand0, bloom_df, cfg)
            .where(F.col("maybe_seen"))
            .count()
        )

        new_keys = admitted.select("shard_id", "h1", "url_hash")
        bloom_df = dedup.update_bloom(
            bloom_df, new_keys, cfg, wave, emit_shards=list(range(cfg.bloom_shards))
        ).localCheckpoint()
        url_seen = url_seen.unionByName(
            admitted.select("url_canon", "url_hash").withColumn(
                "wave", F.lit(wave).cast("int")
            )
        ).localCheckpoint()
        admitted.unpersist()
        row = {
            "wave": wave,
            "cand": n_urls,
            "maybe": int(maybe),
            "seen_total": int(seen_total),
            "seen_fresh": int(seen_fresh),
            "admitted": int(n_admitted),
            "sec": round(sec, 3),
            "steal_pct": (cpu or {}).get("steal_pct"),
        }
        rows.append(row)
        print(f"wave {wave}: {row}", file=sys.stderr)

    # widest-cadence compaction, the loop's flow (loop.py:578-587):
    # url_seen rewritten to live rows only, bloom rebuilt from them
    t0 = time.monotonic()
    live = (
        url_seen.groupBy("url_canon")
        .agg(F.max("wave").alias("wave"), F.first("url_hash").alias("url_hash"))
        .select("url_canon", "url_hash", "wave")
        .localCheckpoint()
    )
    rebuilt_keys = live.join(
        cand0.select("url_canon", "shard_id", "h1").distinct(), on="url_canon"
    ).select("shard_id", "h1", "url_hash")
    bloom_df = dedup.update_bloom(
        dedup.empty_bloom_df(spark, cfg), rebuilt_keys, cfg, n_waves,
        emit_shards=list(range(cfg.bloom_shards)),
    ).localCheckpoint()
    compact_sec = round(time.monotonic() - t0, 3)
    post = {
        "seen_total_after_compact": int(live.count()),
        "compact_sec": compact_sec,
    }
    print(f"compaction: {post}", file=sys.stderr)

    # bounded = the backstop build side and the wave wall are flat in
    # the steady state (waves 3+) while the raw log keeps growing
    steady = rows[3:] if len(rows) > 4 else rows[1:]
    headline = {
        "metric": "recrawl-heavy backstop growth",
        "n_urls": n_urls,
        "waves": n_waves,
        "recrawl_ttl_waves": cfg.recrawl_ttl_waves,
        "seen_total_last": rows[-1]["seen_total"],
        "seen_fresh_max_steady": max(r["seen_fresh"] for r in steady),
        "sec_steady": [r["sec"] for r in steady],
        "bounded": max(r["seen_fresh"] for r in steady)
        <= 2 * cfg.recrawl_ttl_waves * n_urls,
        **post,
    }
    art_dir = os.path.join(REPO, "BENCH", "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    art = os.path.join(
        art_dir, f"backstop_recrawl_{n_urls}_{int(time.time())}.json"
    )
    with open(art, "w") as f:
        json.dump({"headline": headline, "waves": rows}, f, indent=1)
    print(f"full evidence -> {art}", file=sys.stderr)
    print(json.dumps(headline))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
