"""HyperLogLog + count-min sketches: accuracy bands, mergeability
(the property that makes them worth having at 100 TB), and CMS
never-underestimates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler import sketches


@pytest.fixture(scope="module")
def keyed_items(spark):
    # two groups with known cardinalities: g=a has 3000 distinct ids,
    # g=b has 40 distinct ids (exercises the linear-counting branch)
    return spark.range(6000).select(
        F.when(F.col("id") < 3000, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        F.when(F.col("id") < 3000, F.col("id"))
        .otherwise(3000 + F.col("id") % 40)
        .alias("item"),
    )


def test_hll_accuracy_both_branches(spark, keyed_items):
    out = {
        r["g"]: r["hll_distinct"]
        for r in sketches.hll_distinct(keyed_items, ["g"], "item", p=9).collect()
    }
    # m=512 -> relative error ~1.04/sqrt(512) ~ 4.6%; allow 3 sigma
    assert abs(out["a"] - 3000) / 3000 < 0.15
    # small range goes through linear counting: tight at 40 items
    assert abs(out["b"] - 40) <= 3


def test_hll_registers_merge_equals_one_shot(spark, keyed_items):
    """Sketch built per-half then merged (max per bucket) must equal the
    one-shot sketch — the property that lets per-day sketches roll up."""
    half1 = keyed_items.where("id % 2 = 0")
    half2 = keyed_items.where("id % 2 = 1")
    merged = (
        sketches.hll_registers(half1, ["g"], "item", p=9)
        .unionByName(sketches.hll_registers(half2, ["g"], "item", p=9))
        .groupBy("g", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    one_shot = sketches.hll_estimate(
        sketches.hll_registers(keyed_items, ["g"], "item", p=9), ["g"], p=9
    )
    merged_est = sketches.hll_estimate(merged, ["g"], p=9)
    assert sorted(map(tuple, merged_est.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


def test_hll_insensitive_to_duplicates(spark):
    once = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("item"))
    tenfold = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") % 500).alias("item")
    )
    a = sketches.hll_distinct(once, ["g"], "item").collect()[0]["hll_distinct"]
    b = sketches.hll_distinct(tenfold, ["g"], "item").collect()[0]["hll_distinct"]
    assert a == b


def test_countmin_never_underestimates_and_tops_exact(spark):
    # zipf-ish multiset: item k appears 1000//(k+1) times
    items = spark.range(50).select(
        F.col("id").alias("k"),
        F.expr("explode(sequence(1, CAST(1000 / (id + 1) AS INT)))").alias("_"),
    ).select(F.concat(F.lit("w"), F.format_string("%02d", "k")).alias("item"))
    out = sketches.countmin_topk(items, "item", d=4, w=256, k=10).collect()
    assert len(out) == 10
    for r in out:
        assert r["cms_est"] >= r["exact_cnt"]  # CMS only overestimates
    # the true heaviest item must rank first (w=256 cells, 50 keys ->
    # collisions cannot displace a 1000-count head)
    assert out[0]["item"] == "w00" and out[0]["exact_cnt"] == 1000
