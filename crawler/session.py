"""Tuned SparkSession builder.

One place for the engine's Spark conf so tests, bench, and spark-submit
all run the same plan-shaping flags: AQE (runtime re-plan + skew-join
splitting), Arrow for every pandas UDF hop, shuffle partitions sized to
cores (not the 200 default), and broadcast threshold left to Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    # glibc malloc tuning for the JVM + Python workers (children of
    # this process inherit the env; setdefault keeps every knob
    # overridable).  Root cause, measured on this host: the
    # applyInPandas bloom-probe stage ran at 47-90% SYSTEM time across
    # 32 cores — glibc hands every >=128 KB buffer (pandas/numpy/Arrow
    # batches) straight to mmap, and each free munmaps it, so 32
    # workers generate a continuous mmap/munmap stream whose TLB
    # shootdowns and page-table churn burn the machine in kernel mode
    # (the round-2..5 'kernel-time inflation degraded mode' in
    # BENCH/BASELINE.md).  Raising the mmap/trim thresholds keeps those
    # buffers on the arena heap (reused, no syscall per batch):
    # measured 8.3 s/47% sys -> 3.1 s/6% sys on the 6.4M-row probe.
    # Memory cost: arenas hold peak-RSS instead of returning pages
    # eagerly — bounded by workers × peak batch footprint (~100 MB
    # each here); size the thresholds down on memory-tight executors.
    for k, v in (
        ("MALLOC_ARENA_MAX", "4"),
        ("MALLOC_MMAP_THRESHOLD_", "1073741824"),
        ("MALLOC_TRIM_THRESHOLD_", "1073741824"),
    ):
        os.environ.setdefault(k, v)
    # shuffle partitions = 4× cores: at 1 task/core a single stalled
    # task (GC pause, hypervisor preemption of one vCPU) stalls the
    # whole stage; 4 waves of tasks smooth stragglers.  Measured on this
    # host: the frontier wave at local[32] goes from 15-40k URLs/s
    # (erratic) to a stable ~150-215k URLs/s.  Same rule as a real
    # cluster's "2-4× total executor cores".
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        cores = cpus if n in ("", "*") else max(int(n), 1)
        shuffle_partitions = 4 * cores

    # shuffle/spill on tmpfs when available — local mode shuffles through
    # spark.local.dir; on a disk-backed /tmp that becomes the bottleneck
    # long before CPU (on a real cluster: fast local SSDs / EBS)
    local_dir = None
    if os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE coalescing stays ON but with a 4MB advisory size (default
        # 64MB collapsed the wave's modest-byte/high-cardinality shuffles
        # to ~5 tasks and serialized the machine): small queries coalesce
        # tight, the wave's wide shuffles keep ≥2 tasks/core
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # long-lived sessions (test suite, wave loops): reclaim shuffle
        # files / broadcast blocks aggressively instead of the 30 min
        # default — JVM resource accretion caused full-suite flakes
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.driver.memory", os.environ.get("CRAWLER_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Pre-spawn the Python worker pool (one trivial mapInPandas pass,
    # ~5 s once): 32 simultaneous CPython spawns each importing
    # pandas/numpy are a measured kernel-time storm (fork + COW faults
    # + import I/O at 60%+ system time) that otherwise lands inside
    # whatever Arrow-stage job runs first — the session owns its
    # warm-up, the first real query shouldn't (guide §4.5: heavyweight
    # init once, before the work).  Workers are reused afterwards
    # (spark.python.worker.reuse default).  CRAWLER_PREWARM_WORKERS=0
    # opts out (e.g. single-query scripts that never touch Python).
    if os.environ.get("CRAWLER_PREWARM_WORKERS", "1") != "0":
        n = max(2, cpus)

        def _ident(batches):
            yield from batches

        spark.range(0, n, 1, n).mapInPandas(_ident, "id long").count()
        # one tiny shuffle+agg+sort warms the exchange/aggregate/sort
        # codegen and memory-manager init that the session's first real
        # query otherwise pays (~1 s measured across the first two
        # battery queries).  The grouping input runs the engine's
        # hottest expression kernels — md5/xxhash64 hashing, array
        # transform/min/distinct/intersect, conv, split — through
        # enough rows that HotSpot compiles the shared intrinsics and
        # interpreted-expression paths up front: the first md5-heavy
        # query of a session (minhash signatures, shingle tables)
        # otherwise pays them mid-query (measured: cold
        # ngram_jaccard_dups 9.8 s → 7.6 s in fresh back-to-back
        # sessions, twice).  The job itself is ~2.5 s once per session,
        # before any caller-visible work.
        from pyspark.sql import functions as _F

        toks = _F.split(
            _F.lower(_F.concat(_F.lit("a b c d "), _F.col("id").cast("string"))),
            " ",
        )
        (
            spark.range(0, 20_000, 1, n)
            .select(
                _F.array_min(
                    _F.transform(toks, lambda t: _F.md5(_F.concat(_F.lit("0|"), t)))
                ).alias("m"),
                _F.array_distinct(
                    _F.transform(
                        toks,
                        lambda w: _F.conv(
                            _F.substring(_F.md5(w), 1, 15), 16, 10
                        ).cast("long"),
                    )
                ).alias("sh"),
                _F.xxhash64(_F.concat_ws(",", toks)).alias("x"),
            )
            .groupBy((_F.size(_F.array_intersect("sh", "sh")) + _F.col("x") % 101).alias("k"))
            .agg(_F.count("*").alias("c"), _F.max("m").alias("m"))
            .orderBy(_F.desc("c"), _F.asc("k"))
            .limit(5)
            .collect()
        )
    return spark
