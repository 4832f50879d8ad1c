#!/usr/bin/env python
"""Sharded full-suite runner (VERDICT r3 item 8).

The single-process suite takes ~2h20m (one shared Spark JVM, 26 files,
serial).  pytest-xdist is not installed in this sandbox, so this runner
shards test FILES across N concurrent pytest processes — each gets its
own Spark JVM (local[4], same conftest fixture), every test and
assertion runs exactly as in the serial suite, and the wall time drops
to roughly the heaviest shard (~30-45 min at N=4 on a quiet host).

Sharding is static, balanced by measured per-file cost so the e2e
battery doesn't land with the fuzz battery.  A file not in the weight
table gets weight 1 (cheap unit suite).

Usage:
    python run_tests.py            # 4 shards
    python run_tests.py 3          # 3 shards
    python run_tests.py 1          # serial (= plain pytest, one JVM)

Exit code 0 iff every shard exits 0.  Per-shard tails are printed on
failure; full logs land in /tmp/crawler-test-shard-*.log.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

#: measured minutes (rounded) from full-suite runs; the balancer packs
#: greedily by descending weight.
WEIGHTS = {
    "test_e2e_crawl.py": 30,
    "test_resume.py": 14,
    "test_fetch_http.py": 11,
    "test_robots_ttl.py": 9,
    "test_politeness.py": 8,
    "test_tpd_budget.py": 7,
    "test_sitemap_ingest.py": 7,
    "test_link_priority.py": 6,
    "test_fuzz_twins.py": 6,
    "test_extract_fidelity.py": 5,
    "test_textops.py": 5,
    "test_warehouse.py": 4,
    "test_robots_streaming_export.py": 4,
    "test_consume.py": 3,
    "test_timeseries.py": 3,
    "test_job_cli.py": 3,
    "test_graph.py": 2,
    "test_plan_guards.py": 2,
    "test_sketches.py": 2,
    "test_dedup.py": 2,
    "test_iceberg_format.py": 10,
    "test_oracle_sweep_gate.py": 4,
    "test_fetch_decode.py": 1,
    "test_extract.py": 1,
    "test_hashing.py": 1,
    "test_urlnorm.py": 1,
    "test_registry_guard.py": 1,
}


def shard_files(n: int) -> list[list[str]]:
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    order = sorted(files, key=lambda f: -WEIGHTS.get(f, 1))
    shards: list[tuple[int, list[str]]] = [(0, []) for _ in range(n)]
    for f in order:
        i = min(range(n), key=lambda k: shards[k][0])
        w, lst = shards[i]
        shards[i] = (w + WEIGHTS.get(f, 1), lst + [f])
    return [lst for _, lst in shards if lst]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    shards = shard_files(max(1, n))
    procs = []
    t0 = time.time()
    for i, files in enumerate(shards):
        log = f"/tmp/crawler-test-shard-{i}.log"
        cmd = [sys.executable, "-m", "pytest", "-q", *[f"tests/{f}" for f in files]]
        env = dict(os.environ)
        # each shard's JVM stays at the conftest local[4]; cap any code
        # that sizes itself from SPARK_GRAFT_CPUS so N shards don't
        # oversubscribe the host
        env.setdefault("SPARK_GRAFT_CPUS", "4")
        # more execution-pool headroom than the solo default: shard
        # JVMs spill more under host contention, and one 4g shard hit
        # UNABLE_TO_ACQUIRE_MEMORY in a hash-agg (host RAM is 128 GiB;
        # N×8g is cheap insurance)
        env.setdefault("CRAWLER_TEST_DRIVER_MEM", "8g")
        print(f"shard {i}: {' '.join(files)} -> {log}")
        procs.append(
            (i, files, log, subprocess.Popen(cmd, cwd=REPO, env=env,
                                             stdout=open(log, "w"),
                                             stderr=subprocess.STDOUT))
        )
    rc = 0
    for i, files, log, p in procs:
        code = p.wait()
        with open(log) as f:
            tail = f.read().strip().splitlines()[-3:]
        status = "OK" if code == 0 else f"FAIL rc={code}"
        print(f"shard {i} [{status}] {'; '.join(tail)}")
        if code != 0:
            rc = 1
            with open(log) as f:
                print("".join(f.read().splitlines(keepends=True)[-60:]))
    print(f"total wall: {time.time() - t0:.0f}s across {len(shards)} shards")
    return rc


if __name__ == "__main__":
    sys.exit(main())
