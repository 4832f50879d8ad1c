"""Frontier construction & merge (SURVEY.md §2.1 S4/S6, §2.5 R2/R8).

The reference's frontier is RabbitMQ queues keyed by TPD with FIFO
order (FrontierSink.scala:15-24, RabbitData.scala:64); ours is a
log-structured table pair:

    frontier_adds      append-only rows (FRONTIER schema)
    frontier_consumed  append-only (url_canon, wave_added, seq) keys

pending = adds ANTI-JOIN consumed; a compaction wave rewrites adds :=
pending and truncates consumed (bounds the anti-join at scale — the
Iceberg equivalent is positional delete files + rewrite_data_files).

Per-host FIFO is carried by `seq`: new rows added in wave w get
seq = ((w+1) << 32) | rank-within-host, rank ordered by the
deterministic discovery order (fetch_ms, source_url, src_seq, link_pos).
seq only ever needs to be comparable WITHIN a host, so the rank window
partitions by host — no global sort, no driver bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import schemas, urlnorm
from .config import CrawlConfig
from .hashing import h2_expr

_FRONTIER_COLS = [f.name for f in schemas.FRONTIER.fields]

#: Spark type string of one request/response header pair
HEADER_T = "array<struct<name:string,value:string>>"


def request_body_cols() -> list:
    """req_headers / req_entity for crawl-built GET requests:
    WrappedHttpRequest.getUrl(url) carries Nil headers and an empty
    entity (Requests.scala:27-28)."""
    return [
        F.array().cast(HEADER_T).alias("req_headers"),
        F.lit(None).cast("binary").alias("req_entity"),
    ]


def seeds_df(
    spark: SparkSession, seeds: list[str], cfg: CrawlConfig, wave: int = 0
) -> DataFrame:
    """Seed injection (S4, example-app/Main.scala:30,67): literal seed
    list → frontier rows, seq = list position (the reference preserves
    seed submission order into the queue).

    ``wave > 0`` is the periodic RE-seed path (config.reseed_every_waves):
    rows are keyed into wave ``wave`` with seq = (wave<<32) + 2^31 + i —
    the 2^31 offset keeps re-seed keys disjoint from link rows admitted
    into the same wave (their per-host rank lives far below 2^31), so
    the consumed-log anti-join key (url_canon, wave_added, seq) never
    collides, and FIFO still puts re-seeds after that wave's
    discoveries deterministically."""
    rows = [(i, u) for i, u in enumerate(seeds)]
    df = spark.createDataFrame(rows, "i long, url string")
    canon = urlnorm.canonicalize_expr("url")
    host = urlnorm.host_expr("url")
    seq = (
        F.col("i")
        if wave == 0
        else (F.lit((wave << 32) + (1 << 31)).cast("long") + F.col("i"))
    )
    return df.select(
        F.col("url"),
        canon.alias("url_canon"),
        h2_expr(canon).alias("url_hash"),
        host.alias("host"),
        urlnorm.tpd_expr(host).alias("tpd"),
        F.lit("GET").alias("method"),
        *request_body_cols(),
        F.array().cast("array<string>").alias("provenance"),
        F.lit(0.0).alias("priority"),
        seq.alias("seq"),
        F.lit(wave).cast("int").alias("not_before_wave"),
        F.lit(wave).cast("int").alias("wave_added"),
    )


def links_to_frontier(new_links: DataFrame, cfg: CrawlConfig, wave: int) -> DataFrame:
    """Deduped link rows → FRONTIER rows for wave+1.

    new_links carries: dest_url, url_canon, url_hash, host, tpd,
    provenance (source's), source_url, fetch_ms, src_seq, link_pos —
    plus wave_indegree when config.link_priority="indegree".
    Provenance append (Requests.scala:62-65): source.provenance :+
    source.url, last `max_provenance`.

    Priority (north_rule score-ordered frontier, config.link_priority):
    "none" = 0.0 (reference FIFO parity); "depth" = -len(new chain),
    shallow-first; "indegree" = this wave's reference count, counted in
    the dedup probe cogroup.  All three are pure column arithmetic here.
    """
    rank = F.row_number().over(
        Window.partitionBy("host").orderBy("fetch_ms", "source_url", "src_seq", "link_pos")
    )
    next_wave = wave + 1
    prov = urlnorm.provenance_expr("provenance", "source_url", cfg.max_provenance)
    if cfg.link_priority == "depth":
        prio = (-F.size(prov)).cast("double")
    elif cfg.link_priority == "indegree":
        prio = F.col("wave_indegree").cast("double")
    else:
        prio = F.lit(0.0)
    return new_links.select(
        F.col("dest_url").alias("url"),
        F.col("url_canon"),
        F.col("url_hash"),
        F.col("host"),
        F.col("tpd"),
        F.lit("GET").alias("method"),
        *request_body_cols(),
        prov.alias("provenance"),
        prio.alias("priority"),
        (F.lit(next_wave << 32).cast("long") + rank.cast("long")).alias("seq"),
        F.lit(next_wave).cast("int").alias("not_before_wave"),
        F.lit(next_wave).cast("int").alias("wave_added"),
    )


def pending(adds: DataFrame, consumed: DataFrame) -> DataFrame:
    """adds − consumed (left_anti on the composite key)."""
    return adds.join(
        consumed.select("url_canon", "wave_added", "seq"),
        on=["url_canon", "wave_added", "seq"],
        how="left_anti",
    )


def consumed_keys(df: DataFrame, wave: int) -> DataFrame:
    return df.select(
        "url_canon",
        "wave_added",
        "seq",
        F.lit(wave).cast("int").alias("wave_consumed"),
    )
