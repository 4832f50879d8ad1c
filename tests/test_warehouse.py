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
