"""Per-wave per-partition lineage + crawl stats (SURVEY.md §2.6 O8, §2.4 A2).

north_rule: "checkpointed ... after each wave with per-partition lineage
(wave id, partition id, URLs emitted/deduped) so a killed run resumes
exactly".  partition_id here is the politeness/storage partition
pmod(murmur3(tpd), n_shards) — the same bucketing the frontier and the
bloom shards use, so a lineage row describes one physical partition's
wave.

CrawlStats contract (processors/CrawlStats.scala:6-14,
StatsCollectorSpec.scala:24-31): numFetched counts items DELIVERED to
the app (post status filter), numBytesFetched sums their payload bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import schemas
from .config import CrawlConfig
from .hashing import shard_expr


def wave_lineage(
    spark: SparkSession,
    cfg: CrawlConfig,
    wave: int,
    scheduled: DataFrame,
    delivered: DataFrame,
    links: DataFrame,
    new_links: DataFrame,
) -> DataFrame:
    """One aggregation pass per input, full-outer joined on partition_id.
    All JVM-side; the only action is the caller's append."""
    pid = lambda df: df.withColumn("partition_id", shard_expr("tpd", cfg.bloom_shards))

    s = pid(scheduled).groupBy("partition_id").agg(
        F.count("*").alias("urls_scheduled")
    )
    d = pid(delivered).groupBy("partition_id").agg(
        F.count("*").alias("urls_fetched"), F.sum("n_bytes").alias("bytes_fetched")
    )
    l = pid(links).groupBy("partition_id").agg(F.count("*").alias("urls_extracted"))
    n = pid(new_links).groupBy("partition_id").agg(F.count("*").alias("urls_emitted"))

    merged = (
        s.join(d, "partition_id", "full_outer")
        .join(l, "partition_id", "full_outer")
        .join(n, "partition_id", "full_outer")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")
    return merged.select(
        F.lit(wave).cast("int").alias("wave"),
        F.col("partition_id").cast("int"),
        z("urls_scheduled").alias("urls_scheduled"),
        z("urls_fetched").alias("urls_fetched"),
        z("urls_extracted").alias("urls_extracted"),
        (z("urls_extracted") - z("urls_emitted")).alias("urls_deduped"),
        z("urls_emitted").alias("urls_emitted"),
        z("bytes_fetched").alias("bytes_fetched"),
        F.lit(True).alias("committed"),
    )


def crawl_stats(lineage_df: DataFrame) -> tuple[int, int]:
    """(numFetched, numBytesFetched) — the CrawlStats fold (A2)."""
    row = lineage_df.agg(
        F.coalesce(F.sum("urls_fetched"), F.lit(0)).alias("f"),
        F.coalesce(F.sum("bytes_fetched"), F.lit(0)).alias("b"),
    ).collect()[0]
    return int(row["f"]), int(row["b"])
