"""Versioned-table + atomic-catalog semantics."""

from __future__ import annotations

from pyspark.sql import types as T

from crawler.warehouse import Warehouse

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_append_overwrite_versions(spark, wh_root):
    wh = Warehouse(wh_root)
    t = wh.table("t1", SCHEMA)
    v1 = t.append(_df(spark, [(1, "a")]))
    v2 = t.append(_df(spark, [(2, "b")]))
    assert (v1, v2) == (1, 2)
    assert t.read(spark, v1).count() == 1
    assert t.read(spark, v2).count() == 2
    assert t.rows(v2) == 2  # manifest arithmetic, no job
    v3 = t.overwrite(_df(spark, [(9, "z")]))
    assert [r["k"] for r in t.read(spark, v3).collect()] == [9]
    # old snapshots still readable (time travel)
    assert t.read(spark, v2).count() == 2


def test_catalog_snapshot_isolation(spark, wh_root):
    wh = Warehouse(wh_root)
    t = wh.table("t1", SCHEMA)
    v1 = t.append(_df(spark, [(1, "a")]))
    wh.catalog.commit(0, {"t1": v1})
    # stage beyond the commit — committed read must not see it
    t.append(_df(spark, [(2, "b")]))
    assert wh.read_committed(spark, "t1", SCHEMA).count() == 1
    # appends against the COMMITTED base ignore orphaned staged files
    v3 = t.append(_df(spark, [(3, "c")]), base_version=wh.catalog.version_of("t1"))
    wh.catalog.commit(1, {"t1": v3})
    ks = sorted(r["k"] for r in wh.read_committed(spark, "t1", SCHEMA).collect())
    assert ks == [1, 3]  # the orphan (2) never became visible


def test_empty_table_read(spark, wh_root):
    wh = Warehouse(wh_root)
    df = wh.read_committed(spark, "nope", SCHEMA)
    assert df.count() == 0 and df.schema == SCHEMA


def test_commit_extra_state(spark, wh_root):
    wh = Warehouse(wh_root)
    wh.catalog.commit(3, {}, stats={"fetched": 7}, config={"x": 1})
    st = wh.catalog.state()
    assert st["wave"] == 3 and st["stats"] == {"fetched": 7} and st["config"] == {"x": 1}


def test_replace_keys_partial_rewrite(spark, wh_root):
    """Keyed snapshots: only files holding changed keys are rewritten;
    every other file carries forward BY PATH (byte-identical)."""
    wh = Warehouse(wh_root)
    t = wh.table("blobs", SCHEMA)
    # one file per key: write each key's row as its own version-dir
    base = t.overwrite_keyed(_df(spark, [(k, f"v{k}") for k in range(4)]).repartition(4, "k"), "k")
    base_files = set(t.files(base))
    changed = t.keys_needing_rewrite(base, [2])
    assert 2 in changed
    v2 = t.replace_keys(_df(spark, [(k, "NEW") for k in changed]), base, "k")
    new_files = set(t.files(v2))
    # untouched keys' files are the SAME paths
    carried = base_files & new_files
    assert carried, "expected untouched files carried forward by reference"
    rows = {r["k"]: r["v"] for r in t.read(spark, v2).collect()}
    assert rows[2] == "NEW" and len(rows) == 4
    # rows not in any changed file kept their old values
    untouched_keys = set(range(4)) - set(changed)
    assert all(rows[k] == f"v{k}" for k in untouched_keys)
    assert t.rows(v2) == 4


def test_rebase_delta_merges_concurrent_append(spark, wh_root):
    """Optimistic-concurrency rebase: a staged append keeps a concurrent
    writer's appended files when the base moved underneath it."""
    wh = Warehouse(wh_root)
    t = wh.table("t1", SCHEMA)
    v1 = t.append(_df(spark, [(1, "a")]))
    wh.catalog.commit(0, {"t1": v1})
    # "wave" stages an append off v1
    staged = t.append(_df(spark, [(2, "wave")]), base_version=v1)
    # concurrent "intake" appends off v1 and commits first
    v_intake = t.append(_df(spark, [(3, "intake")]), base_version=v1)
    wh.catalog.commit(0, {"t1": v_intake})
    merged = t.rebase_delta(staged, v1, v_intake)
    ks = sorted(r["k"] for r in t.read(spark, merged).collect())
    assert ks == [1, 2, 3]
    assert t.rows(merged) == 3


def test_catalog_lock_reentrant_exclusion(wh_root):
    import threading
    import time as _time

    wh = Warehouse(wh_root)
    order = []

    def hold():
        with wh.catalog.lock():
            order.append("a-in")
            _time.sleep(0.3)
            order.append("a-out")

    th = threading.Thread(target=hold)
    th.start()
    _time.sleep(0.05)
    with wh.catalog.lock():
        order.append("b-in")
    th.join()
    assert order == ["a-in", "a-out", "b-in"]
