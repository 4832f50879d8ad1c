"""Physical-plan regression guards for the scale claims in PLANS.md.

These pin the plan *shapes* the 100 TB design depends on, so a future
edit that quietly forces a broadcast, loses parquet pushdown, or
re-introduces a second UDF evaluation fails fast.
"""

from __future__ import annotations

import pathlib
import re

import crawler


def _formatted_plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_no_forced_broadcast_or_join_hints_in_engine():
    """Round-1 scale-killer: a forced broadcast of the robots cache (one
    row per ever-seen host — unbounded at web scale).  Guard: the engine
    package carries no join hints at all; strategy is always Catalyst's
    by size, so small-at-test-scale tables can grow without OOMing an
    executor."""
    root = pathlib.Path(crawler.__file__).parent
    offenders = []
    for p in sorted(root.glob("*.py")):
        src = p.read_text()
        if re.search(r"F\.broadcast\(|\.hint\(", src):
            offenders.append(p.name)
    assert offenders == []


def test_status_filter_pushes_predicates_to_scan(spark):
    """The scan must do the filtering (PushedFilters) and read only the
    referenced columns (pruned ReadSchema)."""
    import __spark_entry__ as E

    plan = _formatted_plan(E._q_status_filter(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(value,200.0\)", plan)
    # pruned: the events table has more columns than the 3 the query reads
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) == 3


def test_simhash_dups_single_udf_eval_per_side(spark):
    """Joining on a UDF-derived key must not re-derive the UDF through
    an isnotnull() pushdown — exactly one ArrowEvalPython per join side
    (see PLANS.md simhash_dups row)."""
    import __spark_entry__ as E

    plan = _formatted_plan(E._q_simhash_dups(spark, "/root/testdata/sf0.001"))
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 2


def test_wave_scheduler_has_no_python_stage(spark):
    """The politeness emit is closed-form JVM window arithmetic — no
    Arrow/pandas stage anywhere in scheduling (round-2 restructure)."""
    from crawler import politeness, schemas, synth
    from crawler.config import CrawlConfig

    cfg = CrawlConfig()
    pend = synth.synth_frontier(spark, 1000, n_hosts=20)
    host_state = spark.createDataFrame([], schemas.HOST_STATE)
    scheduled, _ = politeness.schedule_wave(pend, host_state, None, cfg, 0)
    plan = _formatted_plan(scheduled)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
