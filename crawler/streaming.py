"""Structured-Streaming seed/request intake (SURVEY.md §2.1 S2/S4/S6).

The reference's frontier intake is a durable RabbitMQ queue consumed
continuously (RabbitPublisher.scala:21-80 → FrontierThrottler.preStart).
The Spark-native analog: a `readStream` file source watching a seed
drop directory; each micro-batch canonicalizes/keys the new requests
and merges them into the frontier via foreachBatch — the same
`frontier_adds` append the wave loop reads, so the batch-iterative
crawl and the streaming intake compose.

Exactly-once, concretely:
  - the catalog commit records the applied batch id
    (`intake_last_batch`); a replayed batch (crash between the catalog
    commit and the streaming checkpoint write) is a no-op, so the
    append is idempotent per batch id.
  - intake and wave commits are serialized by the catalog lock; the
    wave loop additionally REBASES its staged frontier_adds version
    onto any intake appends that landed mid-wave
    (Table.rebase_delta), so neither writer drops the other's rows.

Shape: JSON-lines files with {"url": ..., "priority": ...} records.
`run_intake(..., once=True)` uses availableNow semantics (drain what
exists, then stop) — deterministic for tests; production would leave
the stream running against the drop directory (or swap the source for
Kafka with the same foreachBatch body).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from . import frontier as frontier_mod
from . import urlnorm
from .config import CrawlConfig
from .hashing import h2_expr
from .warehouse import Warehouse

SEED_DROP_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("not_before_wave", T.IntegerType(), True),
        #: optional HTTP verb (proto RequestMethod enum; default GET)
        T.StructField("method", T.StringType(), True),
    ]
)

#: high bit of the low seq word — separates intake-assigned ranks from
#: loop-assigned ranks for the same wave (no collisions between the two
#: writers' seq namespaces)
INTAKE_SEQ_BIT = 1 << 31


def requests_to_frontier_rows(batch: DataFrame, cfg: CrawlConfig, wave: int) -> DataFrame:
    """Normalize raw request records into FRONTIER rows (FrontierSink
    semantics: key by TPD).  Within a batch, rank is ordered by
    (source file, url) — deterministic under replay; per-host FIFO
    across batches is carried by the batch sequence itself (later
    batches get later waves or later catalog positions)."""
    from pyspark.sql.window import Window

    canon = urlnorm.canonicalize_expr("url")
    host = urlnorm.host_expr("url")
    batch = batch.withColumn("_file", F.input_file_name())
    rank = F.row_number().over(
        Window.partitionBy(host).orderBy(F.col("_file"), F.col("url"))
    )
    return batch.select(
        F.col("url"),
        canon.alias("url_canon"),
        h2_expr(canon).alias("url_hash"),
        host.alias("host"),
        urlnorm.tpd_expr(host).alias("tpd"),
        F.coalesce(F.col("method"), F.lit("GET")).alias("method"),
        *frontier_mod.request_body_cols(),
        F.array().cast("array<string>").alias("provenance"),
        F.coalesce(F.col("priority"), F.lit(0.0)).alias("priority"),
        (
            F.lit(((wave + 1) << 32) + INTAKE_SEQ_BIT).cast("long") + rank.cast("long")
        ).alias("seq"),
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
    """Stream the seed drop directory into frontier_adds (see module
    docstring for the exactly-once mechanics)."""
    from . import schemas

    wh = Warehouse(warehouse_root)
    stream = (
        spark.readStream.schema(SEED_DROP_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(drop_dir)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        apply_intake_batch(wh, batch, batch_id, cfg)

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


#: input schema of the streaming throttler: a request stream stamped
#: with a logical submission clock
THROTTLE_IN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("tpd", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("submit_ms", T.LongType(), False),
    ]
)

THROTTLE_OUT = T.StructType(
    THROTTLE_IN.fields + [T.StructField("fetch_ms", T.LongType(), False)]
)

#: per-TPD schedule state carried across micro-batches
_THROTTLE_STATE = T.StructType([T.StructField("next_allowed_ms", T.LongType())])


def throttle_requests_stream(requests, cfg: CrawlConfig):
    """The RabbitThrottler as a genuine Structured-Streaming stateful
    operator (RabbitThrottler.scala:59-66,94-111):
    `groupBy(tpd).applyInPandasWithState` keeps one schedule clock per
    TPD across micro-batches — within and across batches, consecutive
    fetch_ms for a TPD are spaced ≥ its interval, first tick one
    interval after the schedule appears, FIFO by (priority DESC, seq).

    This is the streaming twin of the batch wave scheduler
    (politeness.schedule_wave): same tick arithmetic, state in the
    streaming checkpoint instead of the host_state table.  Schedule
    eviction (the scheduleTimeout analog) belongs to the batch engine's
    next_host_state; here idle state simply stops being updated.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def throttle(key, pdfs, state: "GroupState"):
        tpd = key[0]
        delay = cfg.delay_for(tpd)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(
            ["priority", "seq", "url"], ascending=[False, True, True],
            kind="mergesort",
        )
        if state.exists:
            (next_allowed,) = state.get
        else:
            # fresh schedule: first tick one interval after creation
            next_allowed = int(rows["submit_ms"].min()) + delay
        t = next_allowed
        out = []
        for submit in rows["submit_ms"]:
            t = max(t, int(submit))
            out.append(t)
            t += delay
        state.update((t,))
        rows = rows.assign(fetch_ms=pd.Series(out, index=rows.index, dtype="int64"))
        yield rows

    return requests.groupBy("tpd").applyInPandasWithState(
        throttle,
        outputStructType=THROTTLE_OUT,
        stateStructType=_THROTTLE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def crawl_stats_windowed(
    fetched_stream: DataFrame, window_s: int = 10, watermark_s: int = 30
) -> DataFrame:
    """The StatsCollector as a streaming windowed aggregation with an
    event-time watermark — the continuous twin of `lineage.crawl_stats`
    (StatsCollector fold, Stats.scala / CrawlServiceLike stats sink).

    Per (tumbling event-time window, status) it emits fetched-URL counts
    and byte totals.  The watermark bounds state: a window's aggregate
    is finalized and emitted once event time passes its end by
    ``watermark_s``, after which its state is evicted and later-arriving
    rows for it are dropped — so state stays O(active windows), not
    O(crawl history), at 10^10-URL scale.  Input needs the FETCHED
    event-time/measure columns (fetch_ms, status, n_bytes)."""
    return (
        fetched_stream.withColumn(
            "event_time", F.timestamp_millis(F.col("fetch_ms"))
        )
        .withWatermark("event_time", f"{watermark_s} seconds")
        .groupBy(
            F.window("event_time", f"{window_s} seconds").alias("win"), "status"
        )
        .agg(
            F.count("*").alias("urls_fetched"),
            F.sum("n_bytes").alias("bytes_fetched"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "status",
            "urls_fetched",
            "bytes_fetched",
        )
    )


def sessions_windowed(
    events_stream: DataFrame, gap_s: int = 5, watermark_s: int = 30
) -> DataFrame:
    """Gap-based sessionization as a streaming aggregation — the
    continuous twin of ``__spark_entry__.sessionize`` (which is the
    batch lag→flag→running-sum form), built on Spark's native
    ``session_window``: per user, events merge into one session while
    each arrives within ``gap_s`` of the session's current end; the
    session finalizes (emits in append mode, state evicted) once the
    event-time watermark passes its end.  State is O(open sessions),
    never O(event history), and rows arriving behind the watermark are
    dropped — the bounded-state contract the other streaming twins
    (crawl_stats_windowed, throttle_requests_stream) follow.

    Works identically on a BATCH DataFrame (withWatermark is a no-op
    there), which is what the parity test exploits: the stream's closed
    sessions must equal the batch computation row-for-row.  Input needs
    (ts_ms:long, user_id, value)."""
    return (
        events_stream.withColumn(
            "event_time", F.timestamp_millis(F.col("ts_ms"))
        )
        .withWatermark("event_time", f"{watermark_s} seconds")
        .groupBy(
            F.session_window("event_time", f"{gap_s} seconds").alias("sess"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(docs_stream: DataFrame, watermark_s: int = 600) -> DataFrame:
    """Streaming exact dedup — the continuous twin of
    ``textops.exact_dedup``: fingerprint ``md5(text)`` JVM-side, then
    ``dropDuplicatesWithinWatermark`` on the fingerprint.  The first
    arrival of each fingerprint emits immediately (append mode);
    duplicates arriving within the watermark delay are suppressed.

    Bounded-state contract (the honest streaming tradeoff vs the batch
    global first-wins): a fingerprint's state entry evicts once the
    watermark passes its event time + delay, so a duplicate arriving
    LATER than the dedup horizon is re-emitted — size ``watermark_s``
    to the horizon the pipeline needs, or run the batch pass as the
    backstop (exactly how the crawl pairs the bloom prefilter with the
    exact anti-join).  State is O(distinct fingerprints within the
    horizon), never O(stream history).  Input needs
    (ts_ms:long, doc_id, text)."""
    return (
        docs_stream.withColumn(
            "event_time", F.timestamp_millis(F.col("ts_ms"))
        )
        .withColumn("text_md5", F.md5("text"))
        .withWatermark("event_time", f"{watermark_s} seconds")
        .dropDuplicatesWithinWatermark(["text_md5"])
        .select("doc_id", "text_md5", "event_time")
    )


def apply_intake_batch(
    wh: Warehouse, batch: DataFrame, batch_id: int, cfg: CrawlConfig
) -> bool:
    """Idempotent, lock-serialized application of one intake micro-batch.
    Returns True if applied, False if skipped as a replay."""
    from . import schemas

    state0 = wh.catalog.state()
    if batch_id <= state0.get("intake_last_batch", -1):
        return False  # replayed batch after a crash — already applied
    rows = requests_to_frontier_rows(batch, cfg, state0["wave"])
    t = wh.table("frontier_adds", schemas.FRONTIER)
    # append + commit under the lock (seed batches are small — the wave
    # loop holds this lock only for its manifest-arithmetic commit)
    with wh.catalog.lock():
        st = wh.catalog.state()
        if batch_id <= st.get("intake_last_batch", -1):
            return False
        v = t.append(rows, base_version=st["tables"].get("frontier_adds", 0))
        wh.catalog.commit(
            st["wave"], {"frontier_adds": v}, intake_last_batch=batch_id
        )
    return True
