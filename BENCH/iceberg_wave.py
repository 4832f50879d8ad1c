"""Backend overhead bench (VERDICT r4 item 3): the Iceberg backend had
correctness evidence but zero performance evidence.

Measures the per-wave STATE-TABLE cycle — the exact table operations
``loop.run_wave`` issues against the warehouse each wave — on
``table_format="native"`` vs ``"iceberg"`` over the same synthetic
frontier.  The wave's logical plan (schedule/dedup/extract) is backend-
independent, so this isolates precisely what differs: snapshot commit
metadata (JSON manifests vs Iceberg metadata.json + Avro manifest
lists/manifests), the keyed bloom replace (per-file key JSON vs
identity-partitioned manifests) and the read paths (manifest file list
vs manifest-list resolution + the broadcast partition-mapping join).

Cycle per backend (mirrors loop.run_wave's table I/O):
  init   : frontier overwrite (n_urls rows), bloom overwrite_keyed
           (bloom_shards real empty-bloom blobs), url_seen overwrite,
           catalog commit
  wave   : committed frontier scan (count), url_seen append of every
           frontier key, bloom replace_keys over ALL shards (a full
           wave touches every shard — uniform url hashing), pruned
           bloom read of 8 shards, catalog commit

Run:  python BENCH/iceberg_wave.py [n_urls] [reps]
Defaults: 12.8M (the scaling-gate input), best-of-2 per backend.
Prints one JSON line: per-step seconds per backend + the
iceberg/native wave ratio.  Full evidence -> BENCH/artifacts/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_backend(spark, root: str, fmt: str, pend, cfg) -> dict:
    from pyspark.sql import functions as F

    from crawler import dedup, schemas
    from crawler.warehouse import Warehouse

    wh = Warehouse(root, table_format=fmt)
    fr = wh.table("frontier_adds", schemas.FRONTIER)
    seen = wh.table("url_seen", schemas.URL_SEEN)
    bloom = wh.table("url_seen_bloom", schemas.URL_SEEN_BLOOM)
    steps: dict[str, float] = {}

    def step(name, fn):
        t0 = time.monotonic()
        out = fn()
        steps[name] = round(time.monotonic() - t0, 3)
        return out

    bloom_df = dedup.empty_bloom_df(spark, cfg)
    v_fr = step("init_frontier_overwrite", lambda: fr.overwrite(pend))
    v_bl = step(
        "init_bloom_overwrite_keyed",
        lambda: bloom.overwrite_keyed(bloom_df, "shard_id"),
    )
    v_sn = step(
        "init_url_seen",
        lambda: seen.overwrite(spark.createDataFrame([], schemas.URL_SEEN)),
    )
    wh.catalog.commit(
        0,
        {"frontier_adds": v_fr, "url_seen_bloom": v_bl, "url_seen": v_sn},
    )

    t0 = time.monotonic()
    n = step(
        "read_frontier_count",
        lambda: wh.read_committed(spark, "frontier_adds", schemas.FRONTIER).count(),
    )
    keys = (
        wh.read_committed(spark, "frontier_adds", schemas.FRONTIER)
        .select("url_canon", "url_hash")
        .withColumn("wave", F.lit(1).cast("int"))
    )
    v_sn = step("append_url_seen", lambda: seen.append(keys))
    v_bl = step(
        "replace_bloom_all_shards",
        lambda: bloom.replace_keys(bloom_df, v_bl, "shard_id"),
    )
    step(
        "read_pruned_8_shards",
        lambda: bloom.read_pruned(spark, "shard_id", list(range(8)), v_bl).count(),
    )
    step(
        "commit",
        lambda: wh.catalog.commit(
            1,
            {"frontier_adds": v_fr, "url_seen_bloom": v_bl, "url_seen": v_sn},
        ),
    )
    wave_sec = round(time.monotonic() - t0, 3)
    return {"fmt": fmt, "rows": int(n), "wave_sec": wave_sec, "steps": steps}


def main() -> int:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 12_800_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from crawler import synth
    from crawler.config import CrawlConfig
    from crawler.session import get_spark

    import bench  # repo-root bench: cpu-evidence helpers

    cfg = CrawlConfig(
        bloom_shards=64,
        bloom_expected_insertions=max(1_000_000, n_urls),
    )
    spark = get_spark("iceberg-wave-bench", master=f"local[{cpus}]")
    pend = synth.synth_frontier(spark, n_urls, n_hosts=max(2000, n_urls // 500))
    pend = pend.persist()
    pend.count()

    base = tempfile.mkdtemp(
        prefix="icewave-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    runs: dict[str, list[dict]] = {"native": [], "iceberg": []}
    try:
        for rep in range(reps):
            for fmt in ("native", "iceberg"):
                root = os.path.join(base, f"{fmt}{rep}")
                c0 = bench._cpu_sample()
                out = run_backend(spark, root, fmt, pend, cfg)
                out["cpu"] = bench._cpu_delta(c0, bench._cpu_sample())
                runs[fmt].append(out)
                print(f"rep{rep} {fmt}: {out['wave_sec']}s {out['steps']}",
                      file=sys.stderr)
                shutil.rmtree(root, ignore_errors=True)
    finally:
        pend.unpersist()
        shutil.rmtree(base, ignore_errors=True)

    best = {f: min(rs, key=lambda r: r["wave_sec"]) for f, rs in runs.items()}
    ratio = round(best["iceberg"]["wave_sec"] / best["native"]["wave_sec"], 3)
    headline = {
        "metric": "state-table wave cycle iceberg/native",
        "n_urls": n_urls,
        "reps": reps,
        "native_wave_sec": best["native"]["wave_sec"],
        "iceberg_wave_sec": best["iceberg"]["wave_sec"],
        "ratio": ratio,
        "native_steps": best["native"]["steps"],
        "iceberg_steps": best["iceberg"]["steps"],
    }
    art_dir = os.path.join(REPO, "BENCH", "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    art = os.path.join(art_dir, f"iceberg_wave_{n_urls}_{int(time.time())}.json")
    with open(art, "w") as f:
        json.dump({"headline": headline, "runs": runs}, f, indent=1)
    print(f"full evidence -> {art}", file=sys.stderr)
    print(json.dumps(headline))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
