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
    an isnotnull() pushdown.  Since the r6 persist of the (doc_id, sim)
    table, BOTH join sides read the ONE cached bit-vote evaluation, so
    the executed plan carries exactly one ArrowEvalPython (inside the
    cache-build subtree) and at least one InMemoryTableScan per side —
    any regression to re-deriving the UDF per side (or through a
    pushed-down filter) shows up as extra ArrowEvalPython nodes."""
    import __spark_entry__ as E

    plan = _formatted_plan(E._q_simhash_dups(spark, "/root/testdata/sf0.001"))
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert len(re.findall(r"InMemoryTableScan", plan)) >= 2


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


def test_asof_join_one_exchange_zero_joins(spark):
    """The as-of join's scale claim: ONE Exchange (the key partition)
    and NO join operator anywhere — the right row attaches via the
    ordered window, never a join materialization."""
    import __spark_entry__ as E

    plan = _formatted_plan(E._q_asof_join(spark, "/root/testdata/sf0.001"))
    body = plan.split("== Physical Plan ==")[1]
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 1
    assert "Join" not in body
    assert len(re.findall(r"\(\d+\) Window", body)) == 1


def test_range_join_never_nested_loop(spark):
    """The bucketized interval join must plan as a hash join on the
    bucket equi-key — a bare inequality join degenerates to
    BroadcastNestedLoopJoin / CartesianProduct (O(points × intervals))."""
    import __spark_entry__ as E

    plan = _formatted_plan(E._q_range_join(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)


def test_hypertable_rollup_single_pass(spark):
    """Multi-granularity rollup in ONE pass: exactly one Expand and one
    Exchange with a map-side partial aggregate — never one scan per
    grain (the UNION ALL shape the DuckDB oracle uses)."""
    import __spark_entry__ as E

    plan = _formatted_plan(E._q_hypertable_rollup(spark, "/root/testdata/sf0.001"))
    body = plan.split("== Physical Plan ==")[1]
    assert len(re.findall(r"\(\d+\) Expand", body)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", body)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", body)) == 1
