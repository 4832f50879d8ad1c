"""Per-TPD politeness scheduler (SURVEY.md §2.6 O1-O4).

Reference semantics (RabbitThrottler.scala:59-66,94-111,
FrontierThrottler.scala:22-48,64-82):
  - one durable FIFO queue per topPrivateDomain
  - a repeating timer per TPD: first tick one `interval` after the
    schedule is created (addSchedule(key, delay=interval, interval)),
    then every `interval`; each tick dequeues EXACTLY ONE message
  - interval = customDomainDelays.get(tpd) | perDomainDelay
  - an empty tick increments a CUMULATIVE per-TPD counter (never reset,
    FrontierThrottler.scala:76-82); at `scheduleTimeout` the schedule is
    cancelled; the next incoming request re-creates it (fresh initial
    delay)

Spark shape — a logical clock replaces wall time (deterministic,
cluster-size-invariant): wave w spans [w·wave_ms, (w+1)·wave_ms).  Per
TPD, the scheduler emits FIFO-next rows at fetch_ms = max(next_allowed,
win_start), +delay per row, while fetch_ms < win_end.  With wave_ms ==
delay this is exactly the reference's one-per-tick.

Skew story (north_rule): the per-TPD group only ever needs its top-K
candidates (K = ceil(wave_ms/delay)), so a mega-host never funnels its
millions of pending rows into one group — a SALTED two-phase top-k
(partition (tpd, pmod(seq,S)) → top-K per salt → exact top-K per tpd)
prunes first.  Any true top-K row is top-K within its salt bucket, so
the prune is lossless.  AQE skew-join splitting stays on for the joins.

The emit itself is pure JVM: ticks are an arithmetic progression, so
fetch_ms = start + (rank-1)·delay over an exact per-TPD row_number of
the (bounded) candidate set — no Python anywhere in scheduling.  The
full queue order is (priority DESC, seq ASC, url_canon ASC); url_canon
breaks seq ties deterministically when two hosts share a TPD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.window import Window

from . import schemas
from .config import CrawlConfig

#: scheduler output = frontier row + fetch timestamp
SCHEDULED = T.StructType(
    schemas.FRONTIER.fields
    + [
        T.StructField("delay_ms", T.IntegerType(), False),
        T.StructField("fetch_ms", T.LongType(), False),
    ]
)

_FRONTIER_COLS = [f.name for f in schemas.FRONTIER.fields]

def queue_order() -> list:
    """The per-TPD queue order (FrontierThrottler FIFO + priority on
    top); url_canon is the deterministic tie-break for equal (priority,
    seq) — two hosts sharing a TPD can carry equal seq values."""
    return [F.col("priority").desc(), F.col("seq").asc(), F.col("url_canon").asc()]


def delay_expr(tpd_col: str, cfg: CrawlConfig):
    """interval = customDomainDelays.get(tpd) | perDomainDelay
    (FrontierThrottler.scala:42) — as a JVM expression."""
    c = F.col(tpd_col)
    if not cfg.domain_delays:
        return F.lit(cfg.per_domain_delay_ms)
    pairs = []
    for k, v in sorted(cfg.domain_delays.items()):
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    return F.coalesce(m.getItem(c), F.lit(cfg.per_domain_delay_ms)).cast("int")


def robots_split(pending: DataFrame, robots: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked) by RFC-9309 robots rules — pure JVM (left join
    on host + longest-match verdict over the compiled rule array; see
    robots.blocked_expr for the precedence semantics).

    No broadcast hint: the robots cache holds one row per ever-seen host
    (unbounded at web scale) — AQE picks broadcast while it is small and
    falls back to a shuffle join on `host` when it is not."""
    from . import robots as robots_mod

    r = robots.select("host", "rules")
    joined = pending.join(r, on="host", how="left")
    blocked_pred = robots_mod.blocked_expr(
        F.col("rules"), robots_mod.match_target_expr("url")
    )
    allowed = joined.where(~blocked_pred).drop("rules")
    blocked = joined.where(blocked_pred).drop("rules")
    return allowed, blocked


def _topk_salted(df: DataFrame, k_col: str, cfg: CrawlConfig) -> DataFrame:
    """Lossless salted per-TPD candidate prune by QUEUE_ORDER.

    One window over (tpd, salt) keeps ≤K rows per salt bucket — any row
    in the true per-TPD top-K is in its bucket's top-K, so the union
    (≤ K·S rows per TPD) is a superset of the exact top-K.  The exact
    rank stage then runs over this bounded set, so a mega-host's
    millions of pending rows never sort in one partition.

    (A binding-set gate that routes only over-K TPDs into the window —
    the loop's admission-budget pattern — was tried in r6 and REVERTED:
    the gate's count pass plus the safe/risky split reference the
    un-cached upstream three times, and re-executing the 8M-row
    pending pipeline twice more cost ~10 s against the ~3 s the
    smaller stage-1 sort saved.  Worth revisiting only with a caller-
    owned cache of the eligible set.)"""
    salt = F.pmod(F.col("seq"), F.lit(cfg.skew_salt_buckets))
    w1 = Window.partitionBy(F.col("tpd"), salt).orderBy(*queue_order())
    return (
        df.withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= F.col(k_col))
        .drop("_rn1")
    )


def schedule_wave(
    pending: DataFrame,
    host_state: DataFrame,
    robots: DataFrame | None,
    cfg: CrawlConfig,
    wave: int,
) -> tuple[DataFrame, DataFrame]:
    """frontier-pending → (scheduled rows with fetch_ms, robots_blocked).

    `pending` must have the FRONTIER schema; `host_state` the HOST_STATE
    schema.  Pass robots=None when the robots table is known empty (the
    loop reads row counts from manifests for free) to skip the join.
    The caller derives the next host_state from the outputs
    (see next_host_state)."""
    win_start = wave * cfg.wave_ms
    win_end = (wave + 1) * cfg.wave_ms

    # Empty-robots fast path (the dedup backstop's first-wave pattern):
    # a caller that cannot cheaply know the cache is empty (the loop
    # reads manifests and passes None; a generic caller may hand over
    # an empty DataFrame) still deserves the None plan — the join +
    # RFC-9309 verdict evaluation against a cache that blocks nothing
    # measured 7.2 s vs 4.0 s for the identical None path over an 8M-row
    # frontier (it also breaks whole-stage fusion into the window
    # stages).  The probe is a bounded limit-1 scan (~50 ms against a
    # real table); outputs are identical by construction: an empty
    # cache blocks nothing and declares no crawl delay.
    if robots is not None and robots.isEmpty():
        robots = None

    eligible = pending.where(F.col("not_before_wave") <= F.lit(wave))
    if robots is None:
        allowed, blocked = eligible, eligible.limit(0)
    else:
        allowed, blocked = robots_split(eligible, robots)

    delay = delay_expr("tpd", cfg)
    if robots is not None and cfg.honor_crawl_delay:
        # robots Crawl-delay: per TPD the interval becomes the stricter
        # of the configured delay and the max delay any of the TPD's
        # CACHED hosts ever declared (capped) — politeness is durable,
        # not per-wave.  Plan shape: the TPD comes from the cache row's
        # own host string (urlnorm.tpd_expr — pure JVM), so this never
        # touches the pending set: one column-pruned scan of the
        # crawl_delay-declaring sliver of the cache, one tiny agg, and
        # an AQE-broadcast join back onto `allowed`.
        from . import urlnorm

        tpd_cd = (
            robots.where(F.col("crawl_delay_ms").isNotNull())
            .select(
                urlnorm.tpd_expr(F.col("host")).alias("tpd"),
                F.col("crawl_delay_ms"),
            )
            .groupBy("tpd")
            .agg(F.max("crawl_delay_ms").alias("_tpd_cd"))
        )
        allowed = allowed.join(tpd_cd, on="tpd", how="left")
        # NB: F.least SKIPS nulls (least(null, cap) == cap), so the
        # no-declared-delay case must be gated explicitly, not coalesced
        cd = F.when(
            F.col("_tpd_cd").isNotNull(),
            F.least(F.col("_tpd_cd"), F.lit(cfg.robots_max_delay_ms)),
        ).otherwise(F.lit(0))
        delay = F.greatest(delay, cd).cast("int")

    allowed = allowed.withColumn("delay_ms", delay).withColumn(
        "_k", F.ceil(F.lit(cfg.wave_ms) / F.col("delay_ms")).cast("int")
    )

    # schedule state join FIRST: next_allowed; absent row = schedule
    # created THIS wave with the reference's initial delay of one
    # interval.  One row per active TPD — Catalyst auto-broadcasts below
    # threshold; at a 100M-domain frontier it falls back to a shuffle
    # join on tpd.  Joining before the top-k lets us drop every TPD
    # whose clock cannot fire inside this wave (next_allowed ≥ win_end)
    # BEFORE the window shuffle — in a politeness-bound steady state the
    # overwhelming majority of pending rows never enter the sort.
    st = host_state.select("tpd", "next_allowed_ms")
    allowed = allowed.join(st, on="tpd", how="left").where(
        F.coalesce(F.col("next_allowed_ms"), F.lit(0)) < F.lit(win_end)
    )
    candidates = _topk_salted(allowed, "_k", cfg).drop("_k")

    # exact per-TPD queue rank over the bounded candidate set, then the
    # tick progression in closed form — entirely JVM, no Python stage:
    #   start    = max(next_allowed | win_start+delay, win_start)
    #   fetch_ms = start + (rank-1)·delay,  emitted while < win_end
    w2 = Window.partitionBy("tpd").orderBy(*queue_order())
    start = F.greatest(
        F.coalesce(
            F.col("next_allowed_ms"), F.lit(win_start).cast("long") + F.col("delay_ms")
        ),
        F.lit(win_start).cast("long"),
    )
    scheduled = (
        candidates.withColumn("_rn", F.row_number().over(w2))
        .withColumn(
            "fetch_ms",
            (start + (F.col("_rn") - 1).cast("long") * F.col("delay_ms")).cast("long"),
        )
        .where(F.col("fetch_ms") < F.lit(win_end))
        .select(*_FRONTIER_COLS, "delay_ms", "fetch_ms")
    )
    return scheduled, blocked


def next_host_state(
    host_state: DataFrame,
    pending: DataFrame,
    scheduled: DataFrame,
    cfg: CrawlConfig,
    wave: int,
    errored: DataFrame | None = None,
) -> DataFrame:
    """Fold the wave into per-TPD schedule state — all JVM aggregations.

    - TPDs that scheduled rows: next_allowed = max(fetch_ms) + delay,
      cumulative empty counter unchanged
    - TPDs with pending rows but nothing scheduled: state row ensured
      (schedule exists / re-created), empty counter unchanged — the queue
      was not empty
    - TPDs with a state row and NO pending rows: every tick this wave
      polled an empty queue → counter += per-wave tick count; rows
      reaching schedule_timeout are dropped (schedule cancelled,
      FrontierThrottler.scala:76-82)
    - `errored` (optional, cfg.error_cooldown_ms): (tpd, _err_last) —
      the last fetch_ms at which the TPD answered a rate-limit /
      overload status this wave; its next_allowed is pushed to at
      least _err_last + cooldown.  Errored TPDs always scheduled rows
      this wave, so a LEFT join suffices, and F.greatest's null-skip is
      exactly right here: no error row → the normal clock stands.
    """
    win_start = wave * cfg.wave_ms

    sched_agg = scheduled.groupBy("tpd").agg(
        (F.max("fetch_ms") + F.max("delay_ms")).alias("_sched_next")
    )
    pend_agg = pending.groupBy("tpd").agg(F.count("*").alias("_n_pending"))
    ticks = F.ceil(F.lit(cfg.wave_ms) / delay_expr("tpd", cfg)).cast("int")

    merged = (
        host_state.select("tpd", "next_allowed_ms", "empty_waves")
        .join(sched_agg, on="tpd", how="full_outer")
        .join(pend_agg, on="tpd", how="full_outer")
    )
    had_state = F.col("next_allowed_ms").isNotNull()
    next_allowed = F.coalesce(
        F.col("_sched_next"),
        # greatest() ignores nulls → must gate on had_state explicitly
        F.when(had_state, F.greatest(F.col("next_allowed_ms"), F.lit(win_start))),
        # new schedule created this wave, nothing emitted yet
        F.lit(win_start) + delay_expr("tpd", cfg),
    )
    queue_empty = F.col("_n_pending").isNull() & F.col("_sched_next").isNull()
    empty_waves = (
        F.coalesce(F.col("empty_waves"), F.lit(0))
        + F.when(had_state & queue_empty, ticks).otherwise(F.lit(0))
    ).cast("int")
    if errored is not None:
        merged = merged.join(errored, on="tpd", how="left")
        next_allowed = F.greatest(
            next_allowed,
            F.col("_err_last") + F.lit(int(cfg.error_cooldown_ms or 0)),
        )
    return (
        merged.select(
            F.col("tpd"),
            next_allowed.cast("long").alias("next_allowed_ms"),
            empty_waves.alias("empty_waves"),
        )
        .where(F.col("empty_waves") < F.lit(cfg.schedule_timeout_empty_polls))
    )
