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
    # local[N] → shuffle partitions = N keeps every core busy without
    # tiny-task overhead; on a real cluster set ~2-3× total cores.
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("", "*") else max(int(n), 1)

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
        # AQE partition coalescing targets 64MB/partition, which collapses
        # our modest-byte/high-cardinality shuffles (windows, cogroups) to
        # a handful of tasks and serializes the machine — keep skew-join
        # splitting, drop coalescing (measured 3-20x on the wave hot path)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
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
    return spark
