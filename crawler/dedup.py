"""URL-seen dedup — the distributed DuplicateFilter (SURVEY.md §2.2 F2-F4).

Reference: first-wins bloom dedup keyed on the raw URL string
(DuplicateFilter.scala:16-30, buildUrlDuplicateFilter:25-30); we key on
the canonicalized URL (UrlNormalizer semantics, adopted per north_rule)
and must reproduce the reference's *membership set* exactly — so the
bloom is a prefilter and an exact anti-join is the backstop:

  1. within-wave first-wins: row_number over url_canon ordered by the
     deterministic stream order (fetch_ms, source, link_pos) — the batch
     analog of "the first stream element wins"
  2. bloom probe, cogrouped by shard_id with the blob table: bloom-NEGATIVE
     rows are *definitely new* (skip the expensive join entirely — at
     web scale the vast majority of candidates); bloom-POSITIVE rows are
     maybe-seen (true dupes + fpp·new)
  3. exact backstop: LEFT ANTI join of only the maybe-seen rows against
     url_seen — kills bloom false positives, so membership equality with
     the reference holds at any fpp
  4. cuckoo tombstone tier (deletable entries / re-crawl support):
     ADVISORY, never authoritative.  A 16-bit partial-key cuckoo filter
     has false positives (~2·4/2^16 per lookup), so a tombstone hit must
     NOT bypass the exact check — a live key whose fingerprint collides
     with an aged-out key would be double-admitted (ADVICE r3, high).
     Tombstoned keys fall through to the backstop like any other
     bloom-positive row; the backstop's recrawl-TTL freshness filter is
     what actually re-admits aged keys.  The cuckoo's job is state
     hygiene between compactions (deletions recorded, cleared on
     re-add, drained when compaction rebuilds the bloom from live keys)
  5. state update: append new keys to url_seen, fold them into the bloom
     shards (cogrouped, changed shards only)

Scale notes: step 2/5 shuffle by shard_id (same key as the frontier's
storage partitioning → co-located); step 3's join input is ~(dupes +
1e-4·new), not the full candidate set; everything else is JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from . import bloom as B
from . import schemas
from .config import CrawlConfig
from .hashing import h1_expr, h2_expr, shard_expr


def with_url_keys(df: DataFrame, url_col: str, cfg: CrawlConfig) -> DataFrame:
    """Attach url_canon / url_hash / h1 / shard_id (all JVM expressions)."""
    from . import urlnorm

    canon = urlnorm.canonicalize_expr(url_col)
    host = urlnorm.host_expr(url_col)
    tpd = urlnorm.tpd_expr(host)
    return (
        df.withColumn("url_canon", canon)
        .withColumn("host", host)
        .withColumn("tpd", tpd)
        .withColumn("url_hash", h2_expr("url_canon"))
        .withColumn("h1", h1_expr("url_canon"))
        .withColumn("shard_id", shard_expr("tpd", cfg.bloom_shards))
    )


def empty_bloom_df(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    m_bits, _k = B.shard_bloom_bits(
        cfg.bloom_expected_insertions, cfg.bloom_fpp, cfg.bloom_shards
    )
    rows = [
        (i, B.new_bloom(m_bits), B.new_cuckoo(cfg.cuckoo_slots_per_shard), 0, -1)
        for i in range(cfg.bloom_shards)
    ]
    return spark.createDataFrame(rows, schemas.URL_SEEN_BLOOM)


def _probe_schema(
    cand_schema: T.StructType, with_indegree: bool = False
) -> T.StructType:
    fields = list(cand_schema.fields)
    if with_indegree:
        fields.append(T.StructField("wave_indegree", T.LongType(), False))
    return T.StructType(fields + [T.StructField("maybe_seen", T.BooleanType(), False)])


def bloom_probe(
    candidates: DataFrame,
    bloom_df: DataFrame,
    cfg: CrawlConfig,
    first_wins_order: tuple[str, ...] | None = None,
    with_indegree: bool = False,
) -> DataFrame:
    """candidates(+h1,url_hash,shard_id) → + maybe_seen.

    Cogrouped by shard_id: each shard's blob moves once, candidates probe
    it vectorized.  maybe_seen is the BLOOM verdict alone — cuckoo
    tombstones deliberately do NOT mask bloom positives: the cuckoo's
    false positives (~1e-4/lookup at 16-bit fingerprints) would let a
    live, still-fresh key that collides with a tombstoned one skip the
    exact backstop and be double-admitted (ADVICE r3).  Tombstoned keys
    flow to the backstop like any bloom-positive row; re-admission of
    aged keys is decided there by the recrawl-TTL freshness filter,
    which is exact.

    When `first_wins_order` is given, within-wave first-wins dedup runs
    INSIDE the same cogroup — correct globally because equal url_canon ⇒
    equal host ⇒ equal tpd ⇒ equal shard_id, so all duplicates of a key
    meet in one group.  This folds what would otherwise be a separate
    full shuffle+sort (window over url_canon) into the probe's shuffle.

    with_indegree (requires first_wins_order) additionally emits
    `wave_indegree`: how many candidate rows referenced each surviving
    url_canon this wave.  Global per key for the same reason first-wins
    is — every duplicate lands in this group — so the frontier scorer
    (config.link_priority="indegree") costs zero extra shuffles.
    """
    m_bits, k = B.shard_bloom_bits(
        cfg.bloom_expected_insertions, cfg.bloom_fpp, cfg.bloom_shards
    )
    if with_indegree and not first_wins_order:
        raise ValueError("with_indegree requires first_wins_order")
    out_schema = _probe_schema(candidates.schema, with_indegree)
    order = list(first_wins_order) if first_wins_order else None

    def probe(key, cand: pd.DataFrame, blob: pd.DataFrame) -> pd.DataFrame:
        if order is not None and len(cand):
            if with_indegree:
                cand = cand.assign(
                    wave_indegree=cand.groupby("url_canon")["url_canon"]
                    .transform("size")
                    .astype("int64")
                )
            # first-wins needs the multi-key sort only for keys that
            # actually collide this wave: a vectorized duplicated()
            # mask (~30 ms on the mega shard's 1.6M rows) restricts the
            # mergesort — whose multi-column string comparisons are the
            # group's dominant cost (~1 s single-task on that shard) —
            # to the colliding slice.  A wave of unique candidates (the
            # bench wave; any frontier already deduped upstream) skips
            # the sort entirely; dup-heavy waves sort only the dups.
            # Survivor choice is identical: non-colliding rows survive
            # unconditionally, colliding rows keep the order-minimum.
            dup_mask = cand["url_canon"].duplicated(keep=False).to_numpy()
            if dup_mask.any():
                dups = (
                    cand[dup_mask]
                    .sort_values(order, kind="mergesort")
                    .drop_duplicates("url_canon", keep="first")
                )
                cand = pd.concat([cand[~dup_mask], dups])
        if len(cand) == 0:
            if with_indegree and "wave_indegree" not in cand.columns:
                cand = cand.assign(wave_indegree=pd.Series([], dtype="int64"))
            return cand.assign(maybe_seen=pd.Series([], dtype=bool))
        h1 = cand["h1"].to_numpy()
        h2 = cand["url_hash"].to_numpy()
        if len(blob) == 0:
            maybe = pd.Series(False, index=cand.index)
        else:
            bl = blob.iloc[0]
            maybe = B.bloom_contains(bytes(bl["bloom"]), h1, h2, k)
        return cand.assign(maybe_seen=maybe)

    return (
        candidates.groupBy("shard_id")
        .cogroup(bloom_df.groupBy("shard_id"))
        .applyInPandas(probe, schema=out_schema)
    )


def update_bloom(
    bloom_df: DataFrame,
    new_keys: DataFrame,
    cfg: CrawlConfig,
    wave: int,
    emit_shards: list[int] | None = None,
) -> DataFrame:
    """Fold new (h1, url_hash, shard_id) keys into their shard blobs.

    With emit_shards=None, every shard row is emitted (full-table
    rewrite — init path).  With an explicit shard list, ONLY those
    shards are emitted (changed shards + any co-located in the same
    data file) — the incremental path: the caller stitches the result
    into the manifest with Table.replace_keys, carrying every other
    shard's file forward untouched."""
    m_bits, k = B.shard_bloom_bits(
        cfg.bloom_expected_insertions, cfg.bloom_fpp, cfg.bloom_shards
    )
    if emit_shards is not None:
        # prune BEFORE the cogroup: unchanged shards' blobs never enter
        # the shuffle (emit_shards ⊇ new_keys' shards by construction)
        emit = list(emit_shards)
        bloom_df = bloom_df.where(F.col("shard_id").isin(emit))
        new_keys = new_keys.where(F.col("shard_id").isin(emit))

    def fold(key, blob: pd.DataFrame, keys: pd.DataFrame) -> pd.DataFrame:
        if len(blob) == 0:
            base_bloom = B.new_bloom(m_bits)
            base_cuckoo = B.new_cuckoo(cfg.cuckoo_slots_per_shard)
            n0 = 0
        else:
            bl = blob.iloc[0]
            base_bloom, base_cuckoo, n0 = bytes(bl["bloom"]), bytes(bl["cuckoo"]), int(bl["n_items"])
        if len(keys):
            base_bloom = B.bloom_add(
                base_bloom, keys["h1"].to_numpy(), keys["url_hash"].to_numpy(), k
            )
            # re-adding a key clears its tombstone: it is seen again
            base_cuckoo = B.cuckoo_delete(base_cuckoo, keys["url_hash"].to_numpy())
        return pd.DataFrame(
            {
                "shard_id": [key[0]],
                "bloom": [base_bloom],
                "cuckoo": [base_cuckoo],
                "n_items": [n0 + len(keys)],
                "wave": [wave],
            }
        )

    keys = new_keys.select("shard_id", "h1", "url_hash")
    return (
        bloom_df.groupBy("shard_id")
        .cogroup(keys.groupBy("shard_id"))
        .applyInPandas(fold, schema=schemas.URL_SEEN_BLOOM)
    )


def forget_urls(bloom_df: DataFrame, keys: DataFrame, cfg: CrawlConfig, wave: int) -> DataFrame:
    """Tombstone URLs (deletable-entry tier): insert their fingerprints
    into the cuckoo blob.  ADVISORY bookkeeping only — probes ignore
    tombstones (see bloom_probe: a cuckoo FP must not bypass the exact
    backstop), so re-admission of a forgotten URL is decided by the
    backstop: its url_seen row must be aged out of the recrawl-TTL
    window (the loop's only forget source) or deleted by the caller.
    Tombstones are cleared on re-add and drained when compaction
    rebuilds the bloom from live keys."""

    def fold(key, blob: pd.DataFrame, ks: pd.DataFrame) -> pd.DataFrame:
        if len(blob) == 0:
            return pd.DataFrame(
                columns=["shard_id", "bloom", "cuckoo", "n_items", "wave"]
            )
        bl = blob.iloc[0]
        ck = bytes(bl["cuckoo"])
        if len(ks):
            ck, _failed = B.cuckoo_add(ck, ks["url_hash"].to_numpy())
        return pd.DataFrame(
            {
                "shard_id": [key[0]],
                "bloom": [bytes(bl["bloom"])],
                "cuckoo": [ck],
                "n_items": [int(bl["n_items"])],
                "wave": [wave],
            }
        )

    return (
        bloom_df.groupBy("shard_id")
        .cogroup(keys.select("shard_id", "url_hash").groupBy("shard_id"))
        .applyInPandas(fold, schema=schemas.URL_SEEN_BLOOM)
    )


def dedup_candidates(
    candidates: DataFrame,
    url_seen: DataFrame,
    bloom_df: DataFrame,
    cfg: CrawlConfig,
    order_cols: tuple[str, ...] = ("fetch_ms", "source_url", "src_seq", "link_pos"),
    wave: int | None = None,
    with_indegree: bool = False,
) -> DataFrame:
    """First-wins dedup of candidate links against URL-seen.

    candidates must carry url_canon/url_hash/h1/shard_id + order_cols.
    Returns the NEW rows only (one per url_canon), in their original
    columns (probe/bookkeeping columns dropped except h1/shard_id which
    the caller needs for the bloom update).

    Recrawl TTL (cfg.recrawl_ttl_waves + wave): the exact backstop only
    consults url_seen entries still fresh at `wave` — an aged-out entry
    no longer blocks, so the URL is re-admittable.  The freshness
    predicate pushes into the url_seen parquet scan.  The bloom's stale
    positives for aged-out keys all fall through to this filtered
    backstop (tombstones are advisory and never skip it — a cuckoo
    false positive must not mask a live key, ADVICE r3), so correctness
    never depends on the cuckoo in either direction: not on its
    capacity (false negatives) and not on its fingerprint width (false
    positives).  Cost: between compactions the backstop join also
    carries the recrawl-eligible aged keys — a small fraction of the
    bloom-positive minority, rebuilt away at each TTL compaction.

    The returned DataFrame is PERSISTED and materialized; the probe
    intermediate is unpersisted before returning (no storage leak across
    waves).  The caller owns unpersisting the result.
    """
    # Fast path — empty url_seen (every FIRST wave of a crawl, and the
    # bench's synthetic wave): the exact backstop is vacuous, survivors
    # ≡ maybe, so result ≡ the probe output minus its verdict column.
    # Taking it skips a SECOND full columnar cache build of the 6.4M
    # wide candidate rows plus the fresh/maybe/union machinery —
    # measured ~2-4 s per wave at the 8M-URL bench.  The probe (which
    # performs the within-wave first-wins dedup) still runs in full.
    # Data-adaptive via a bounded isEmpty probe (limit-1 scan), not a
    # config: with any seen state at all the split path below runs
    # unchanged.
    if url_seen.isEmpty():
        result = bloom_probe(
            candidates, bloom_df, cfg, first_wins_order=order_cols,
            with_indegree=with_indegree,
        ).drop("maybe_seen").persist()
        result.count()
        return result
    # 1+2. within-wave first-wins folded into the cogrouped bloom probe
    # (one shuffle; globally correct — see bloom_probe); persisted so the
    # fresh/maybe split doesn't re-run the probe pipeline
    probed = bloom_probe(
        candidates, bloom_df, cfg, first_wins_order=order_cols,
        with_indegree=with_indegree,
    ).persist()
    fresh = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
    # 3. exact backstop on the maybe-seen minority only
    if cfg.recrawl_ttl_waves is not None and wave is not None:
        url_seen = url_seen.where(
            F.col("wave") > F.lit(int(wave - cfg.recrawl_ttl_waves))
        )
    survivors = maybe.join(
        url_seen.select("url_canon"), on="url_canon", how="left_anti"
    )
    result = fresh.unionByName(survivors).persist()
    result.count()  # materialize so probed can release its storage now
    probed.unpersist()
    return result
