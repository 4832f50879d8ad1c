"""Mergeable streaming sketches: HyperLogLog distinct counting and
count-min heavy hitters.

At 100 TB a crawl wants per-host / per-partition cardinality and
frequency summaries WITHOUT a count(distinct) shuffle of the raw keys:
a sketch is built with one partial-aggregating pass, its state is a
few KB per group, and two sketches merge with max (HLL registers) or
sum (count-min cells) — so per-day / per-partition sketches roll up to
corpus totals for free.  The reference's StatsCollector keeps exact
counters on a single node (StatsCollector.scala); these are the
distributed analogs that stay cheap when the key space no longer fits
anywhere.

Cross-engine determinism (the DuckDB oracle reproduces every value):
item hashing is md5-based (identical bytes in Spark and DuckDB), and
the HLL register sum is computed in INTEGER space — sum of
2^(52 - rank) as a BIGINT — so no float summation order can drift; the
only floating point is one division (and one ln() in the small-range
branch) per group, rounded before emit.

HLL per Flajolet et al. 2007 ("HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm"), with the standard
small-range linear-counting correction.  Count-min per Cormode &
Muthukrishnan 2005.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crawler.textops import md5_prefix64

#: md5_prefix64 yields a uniform 60-bit non-negative hash.
_HASH_BITS = 60


def hll_registers(
    df: DataFrame, group_cols: list[str], item_col: str, p: int = 9
) -> DataFrame:
    """Build per-group HLL registers: (group..., bucket, max_rank).

    This IS the sketch — m = 2**p rows per group at most, mergeable
    across any partitioning of the input by groupBy(...).max(), which
    is exactly what Spark's partial aggregation already does map-side.
    Scale: one hash-agg shuffle on (group, bucket); the raw item column
    never shuffles.
    """
    q = _HASH_BITS - p  # rank window width; rank in [1, q+1]
    h = md5_prefix64(F.col(item_col).cast("string"))
    bucket = F.shiftright(h, q)
    w = h.bitwiseAND(F.lit((1 << q) - 1))
    # bitlen(w) = length(bin(w)) for w > 0; rank = q - bitlen + 1
    rank = F.when(w == 0, F.lit(q + 1)).otherwise(F.lit(q + 1) - F.length(F.bin(w)))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 9
) -> DataFrame:
    """Collapse registers to one (group..., hll_distinct) row per group.

    Register sum in integer space: S = Σ 2^(52-rank) over present
    buckets + 2^52 per absent bucket (rank 0) — exact BIGINT arithmetic
    (max 2^(p+52) ≤ 2^61 for p ≤ 9), so the estimate is bit-identical
    regardless of aggregation order or engine.  E = α·m²·2^52 / S, with
    the linear-counting correction E = m·ln(m/V) when E ≤ 2.5m and V
    (empty buckets) > 0.
    """
    m = 1 << p
    q = _HASH_BITS - p
    if p > 9:
        raise ValueError("p > 9 overflows the 2^(p+52) integer register sum")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = 1 << (q + 1)  # 2^52 for p = 9
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("present"),
        # python F.shiftleft takes only a literal bit count — SQL form
        # accepts the per-row expression
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {q + 1} - max_rank)")).alias(
            "s_present"
        ),
    )
    s_total = F.col("s_present") + (F.lit(m) - F.col("present")) * F.lit(scale)
    e_raw = F.lit(alpha * m * m * float(scale)) / s_total.cast("double")
    v = (F.lit(m) - F.col("present")).cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(e_raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("hll_distinct")
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], item_col: str, p: int = 9
) -> DataFrame:
    """One-shot per-group approximate distinct count (registers folded
    immediately).  Keep `hll_registers` output instead when the sketch
    must persist / merge across waves or days."""
    return hll_estimate(hll_registers(df, group_cols, item_col, p), group_cols, p)


def hll_estimate_sql(
    table_expr: str, group_expr: str, group_alias: str, item_expr: str, p: int = 9
) -> str:
    """DuckDB twin of hll_distinct() — same md5 hash, same integer
    register sum, same correction branch.  The α·m²·2^52 numerator is
    precomputed HERE (one Python double, embedded as a literal) so both
    engines divide the identical constant — no multiplication-order
    drift."""
    m = 1 << p
    q = _HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = 1 << (q + 1)
    num = alpha * m * m * float(scale)
    return f"""
        WITH h AS (
          SELECT {group_expr} AS grp,
                 ('0x' || substr(md5(CAST({item_expr} AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM {table_expr}
        ),
        regs AS (
          SELECT grp, (h >> {q}) AS bucket,
                 max(CASE WHEN (h & {(1 << q) - 1}) = 0 THEN {q + 1}
                          ELSE {q + 1} - length(bin(h & {(1 << q) - 1})) END) AS max_rank
          FROM h GROUP BY grp, bucket
        ),
        agg AS (
          SELECT grp, count(*) AS present,
                 sum((1::BIGINT) << ({q + 1} - max_rank)) AS s_present
          FROM regs GROUP BY grp
        )
        SELECT grp AS {group_alias}, CAST(round(
          CASE WHEN ({num!r}
                     / CAST(s_present + ({m} - present) * {scale}::BIGINT AS DOUBLE)) <= {2.5 * m}
                    AND present < {m}
               THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - present AS DOUBLE))
               ELSE {num!r}
                    / CAST(s_present + ({m} - present) * {scale}::BIGINT AS DOUBLE)
          END) AS BIGINT) AS hll_distinct
        FROM agg
    """


# ------------------------------------------------------------- count-min


def countmin_cells(items: DataFrame, item_col: str, d: int = 4, w: int = 256) -> DataFrame:
    """Per-occurrence (row, bucket) cells for a d×w count-min sketch.
    Row salts the md5 so the d hash functions are independent."""
    return items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (
                            md5_prefix64(
                                F.concat(F.lit(f"{i}:"), F.col(item_col))
                            )
                            % w
                        ).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell"),
    ).select("item", "cell.row", "cell.bucket")


def countmin_topk(
    df: DataFrame, item_col: str, d: int = 4, w: int = 256, k: int = 25
) -> DataFrame:
    """Heavy hitters by count-min estimate: build the d×w sketch in one
    partial-aggregating pass, then score each DISTINCT item as the min
    of its d cells (classic CMS point query — an overestimate, never
    under).  Exact count carried alongside so the result shows the
    sketch error directly.

    Scale: the sketch is d·w rows REGARDLESS of corpus size (here
    1024), so AQE broadcasts the cell join from the sketch's measured
    runtime size (no forced hint — the engine-wide no-F.broadcast rule
    holds, test_plan_guards); building it is one shuffle keyed on
    (row, bucket) with map-side combine.  Merging sketches from two
    corpora = cell-wise sum, which the same groupBy performs.
    """
    # aggregate to DISTINCT items first, then sketch the vocabulary:
    # a cell's count is the number of occurrences hashing into it ==
    # the sum of exact_cnt over the items hashing into it, so hashing
    # each distinct item d times gives the identical sketch to hashing
    # each OCCURRENCE d times — with |vocab| ≪ occurrences that is
    # ~10× less md5 work, and the old plan's second cells pass +
    # dropDuplicates exchange disappear (guide §2.3 "aggregate before
    # you shuffle", §2.4).  exact_cnt rides the grouping key (it is
    # functionally dependent on item), so the est↔exact join is gone
    # too.
    exact = df.groupBy(F.col(item_col).alias("item")).agg(
        F.count("*").alias("exact_cnt")
    )
    cells = exact.select(
        "item",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (
                            md5_prefix64(F.concat(F.lit(f"{i}:"), F.col("item")))
                            % w
                        ).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell"),
    ).select("item", "exact_cnt", "cell.row", "cell.bucket")
    sketch = cells.groupBy("row", "bucket").agg(
        F.sum("exact_cnt").alias("cnt")
    )
    est = (
        cells.join(sketch, ["row", "bucket"])
        .groupBy("item", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.select("item", "cms_est", "exact_cnt")
        .orderBy(F.desc("cms_est"), F.asc("item"))
        .limit(k)
    )


def countmin_topk_sql(items_cte: str, d: int = 4, w: int = 256, k: int = 25) -> str:
    """DuckDB twin of countmin_topk(): `items_cte` must yield a single
    column `item` (one row per occurrence)."""
    return f"""
        WITH items AS ({items_cte}),
        cells AS (
          SELECT item, i.i AS row,
                 ('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':' || item), 1, 15))::BIGINT
                   % {w} AS bucket
          FROM items CROSS JOIN (SELECT unnest(range({d})) AS i) i
        ),
        sketch AS (SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY row, bucket),
        est AS (
          SELECT item, min(cnt) AS cms_est
          FROM (SELECT DISTINCT item, row, bucket FROM cells) c
          JOIN sketch USING (row, bucket)
          GROUP BY item
        ),
        exact AS (SELECT item, count(*) AS exact_cnt FROM items GROUP BY item)
        SELECT item, cms_est, exact_cnt
        FROM est JOIN exact USING (item)
        ORDER BY cms_est DESC, item ASC LIMIT {k}
    """
