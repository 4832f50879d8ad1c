"""Structured-Streaming seed/request intake (SURVEY.md §2.1 S2/S4/S6).

The reference's frontier intake is a durable RabbitMQ queue consumed
continuously (RabbitPublisher.scala:21-80 → FrontierThrottler.preStart).
The Spark-native analog: a `readStream` file source watching a seed
drop directory; each micro-batch canonicalizes/keys the new requests
and merges them into the frontier via foreachBatch — the same
`frontier_adds` append the wave loop reads, so the batch-iterative
crawl and the streaming intake compose.

Shape: JSON-lines files with {"url": ..., "priority": ...} records.
`run_intake(..., once=True)` uses availableNow semantics (drain what
exists, then stop) — deterministic for tests; production would leave
the stream running against the drop directory (or swap the source for
Kafka with the same foreachBatch body).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from . import urlnorm
from .config import CrawlConfig
from .hashing import h2_expr
from .warehouse import Warehouse

SEED_DROP_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("not_before_wave", T.IntegerType(), True),
    ]
)


def requests_to_frontier_rows(batch: DataFrame, cfg: CrawlConfig, wave: int) -> DataFrame:
    """Normalize raw request records into FRONTIER rows (FrontierSink
    semantics: key by TPD, preserve submission order within the batch)."""
    from pyspark.sql.window import Window

    canon = urlnorm.canonicalize_expr("url")
    host = urlnorm.host_expr("url")
    rank = F.row_number().over(
        Window.partitionBy(host).orderBy(F.col("url"))
    )
    return batch.select(
        F.col("url"),
        canon.alias("url_canon"),
        h2_expr(canon).alias("url_hash"),
        host.alias("host"),
        urlnorm.tpd_expr(host).alias("tpd"),
        F.lit("GET").alias("method"),
        F.array().cast("array<string>").alias("provenance"),
        F.coalesce(F.col("priority"), F.lit(0.0)).alias("priority"),
        (F.lit((wave + 1) << 32) + rank.cast("long")).alias("seq"),
        F.coalesce(F.col("not_before_wave"), F.lit(wave + 1)).cast("int").alias(
            "not_before_wave"
        ),
        F.lit(wave + 1).cast("int").alias("wave_added"),
    )


def run_intake(
    spark: SparkSession,
    warehouse_root: str,
    drop_dir: str,
    checkpoint_dir: str,
    cfg: CrawlConfig,
    once: bool = True,
) -> None:
    """Stream the seed drop directory into frontier_adds.

    foreachBatch gives exactly-once appends against the warehouse: the
    streaming checkpoint records the batch id; the append is idempotent
    per batch because a replayed batch re-stages the same rows against
    the same committed base before the catalog moves.
    """
    from . import schemas

    wh = Warehouse(warehouse_root)
    stream = (
        spark.readStream.schema(SEED_DROP_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(drop_dir)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        wave = wh.catalog.state()["wave"]
        rows = requests_to_frontier_rows(batch, cfg, wave)
        t = wh.table("frontier_adds", schemas.FRONTIER)
        v = t.append(rows, base_version=wh.catalog.version_of("frontier_adds"))
        wh.catalog.commit(wave, {"frontier_adds": v})

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()
