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


def test_concurrent_staging_never_clobbers_manifests(wh_root):
    """VERDICT r2 #1: two stagers racing for version N+1 must never
    silently overwrite each other's manifest.  Races _publish directly
    (no Spark jobs → tight interleaving): 8 threads × 25 rounds all
    start from the same observed latest; every returned version must be
    unique and every manifest must round-trip its own content."""
    import json
    import os
    import threading

    from pyspark.sql import types as T

    from crawler.warehouse import Table

    t = Table(wh_root, "race", T.StructType([T.StructField("k", T.LongType())]))
    results: list[tuple[str, int]] = []
    barrier = threading.Barrier(8)
    errors: list[BaseException] = []

    def writer(tag: str):
        try:
            barrier.wait()
            for i in range(25):
                v = t._publish({"parent": 0, "files": [f"{tag}-{i}"], "rows": 1})
                results.append((f"{tag}-{i}", v))
        except BaseException as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(f"w{j}",)) for j in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    versions = [v for _, v in results]
    assert len(set(versions)) == len(versions) == 200, "version slot collided"
    # every manifest holds exactly the content its claimant submitted
    for tag, v in results:
        with open(os.path.join(wh_root, "race", "_meta", f"v{v:08d}.json")) as f:
            m = json.load(f)
        assert m["files"] == [tag] and m["version"] == v


def test_two_appends_same_base_both_survive(spark, wh_root):
    """Integration shape of the race: wave-style append (outside lock)
    and intake-style append landing off the same base — both manifests
    must exist with disjoint new files; rebase merges both row sets."""
    import threading

    wh = Warehouse(wh_root)
    t = wh.table("t1", SCHEMA)
    v1 = t.append(_df(spark, [(1, "base")]))
    wh.catalog.commit(0, {"t1": v1})
    out: dict[str, int] = {}
    barrier = threading.Barrier(2)

    def stage(name: str, row):
        barrier.wait()
        out[name] = t.append(_df(spark, [row]), base_version=v1)

    a = threading.Thread(target=stage, args=("wave", (2, "wave")))
    b = threading.Thread(target=stage, args=("intake", (3, "intake")))
    a.start(); b.start(); a.join(); b.join()
    assert out["wave"] != out["intake"]
    merged = t.rebase_delta(out["wave"], v1, out["intake"])
    ks = sorted(r["k"] for r in t.read(spark, merged).collect())
    assert ks == [1, 2, 3], "a staged append lost rows to the race"


def test_flock_released_by_dead_holder(wh_root):
    """A SIGKILLed lock holder must not wedge the catalog: flock is
    released by the kernel when the holder's fd closes — no stale-break
    path, no timeout wait."""
    import os
    import subprocess
    import sys
    import time as _time

    wh = Warehouse(wh_root)  # creates the root dir before the child opens it
    child = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import fcntl, os, sys, time\n"
                f"fd = os.open({os.path.join(wh_root, '_catalog.lock')!r},"
                " os.O_CREAT | os.O_RDWR)\n"
                "fcntl.flock(fd, fcntl.LOCK_EX)\n"
                "print('locked', flush=True)\n"
                "time.sleep(60)\n"
            ),
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    assert child.stdout.readline().strip() == "locked"
    child.kill()
    child.wait()
    t0 = _time.monotonic()
    with wh.catalog.lock(timeout_s=5.0):
        pass  # acquired despite the dead holder
    assert _time.monotonic() - t0 < 2.0, "lock acquisition waited on a dead holder"


def test_expire_drops_unreachable_snapshots(spark, wh_root):
    """expire(keep_last=1): manifests+files below the committed version
    vanish, the committed snapshot stays readable byte-for-byte, and
    staged-above-commit versions (in-flight work) are never touched."""
    import os

    wh = Warehouse(wh_root)
    t = wh.table("t1", SCHEMA)
    versions = [t.overwrite(_df(spark, [(i, f"v{i}")])) for i in range(1, 5)]
    wh.catalog.commit(0, {"t1": versions[-1]})
    staged = t.append(_df(spark, [(99, "staged")]), base_version=versions[-1])

    def n_data_files():
        total = 0
        for root, _, files in os.walk(os.path.join(wh_root, "t1", "_data")):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    before = n_data_files()
    report = wh.expire(keep_last=1)
    assert report["t1"]["manifests_dropped"] == 3
    assert n_data_files() < before, "expiry deleted no data files"
    # committed read intact; staged version intact
    assert [r["k"] for r in wh.read_committed(spark, "t1", SCHEMA).collect()] == [4]
    ks = sorted(r["k"] for r in t.read(spark, staged).collect())
    assert ks == [4, 99]
    # expired snapshots are gone
    assert not os.path.exists(t._meta_path(versions[0]))


def test_orphaned_claim_tmp_not_a_version(spark, wh_root):
    """An in-flight (or kill-orphaned) ``v{N}.json.tmp.<hex>`` claim file
    in _meta must not count as a staged version: latest_version() taking
    it at face value would make the next read()/append() open a manifest
    that does not exist (the claim's target was never linked)."""
    import os

    wh = Warehouse(wh_root)
    t = wh.table("t_orphan", SCHEMA)
    v1 = t.append(_df(spark, [(1, "a")]))
    # simulate a stager killed between tmp write and os.link
    orphan = os.path.join(wh_root, "t_orphan", "_meta", "v00000002.json.tmp.dead")
    with open(orphan, "w") as f:
        f.write("{}")
    assert t.latest_version() == v1
    assert t.read(spark).count() == 1  # version=None path resolves v1
    v2 = t.append(_df(spark, [(2, "b")]))  # next append claims slot 2
    assert v2 == 2
    assert t.read(spark, v2).count() == 2


def test_read_pruned_skips_files_and_matches_full_read(spark, wh_root):
    """Manifest file-skipping: a keyed snapshot read with a key subset
    must scan ONLY the files holding those keys (Iceberg partition-
    pruned scan analog) and return exactly the full read's rows for the
    requested keys (plus co-located extras, which callers treat as
    inert)."""
    wh = Warehouse(wh_root)
    t = wh.table("kt", SCHEMA)
    # 8 keys across 4 files (2 keys per file, pinned by repartition)
    v = t.overwrite_keyed(
        _df(spark, [(k, f"v{k}") for k in range(8)]).repartition(4, "k"), "k"
    )
    full = t.read(spark, v)
    want = {3, 6}
    pruned = t.read_pruned(spark, "k", want, version=v)
    # strictly fewer input files than the snapshot
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    got = {r["k"] for r in pruned.collect()}
    assert want <= got  # every requested key present...
    # ...and nothing beyond the kept files' recorded key sets
    fk = t._manifest(v)["file_keys"]
    allowed = set().union(*(ks for f, ks in fk.items() if set(ks) & want))
    assert got == allowed
    # a key in NO file: falls through to zero rows, like the full read
    assert t.read_pruned(spark, "k", {999}, version=v).count() == 0
    # tables without key metadata fall back to the full snapshot
    t2 = wh.table("plain", SCHEMA)
    v2 = t2.append(_df(spark, [(1, "a"), (2, "b")]))
    assert t2.read_pruned(spark, "k", {1}, version=v2).count() == 2


def test_read_changes_incremental_scan(spark, wh_root):
    """Iceberg-style changelog read: the manifest file-set diff yields
    exactly the inserted/deleted rows between two snapshots, and an
    append's incremental scan reads ONLY the new files."""
    wh = Warehouse(wh_root)
    t = wh.table("cdc", SCHEMA)
    v1 = t.append(_df(spark, [(1, "a"), (2, "b")]))
    v2 = t.append(_df(spark, [(3, "c")]))
    # append: only the new rows, all inserts
    ch = t.read_changes(spark, v1, v2).collect()
    assert [(r["k"], r["_change_type"]) for r in ch] == [(3, "insert")]
    # full history from empty
    ch0 = t.read_changes(spark, 0, v2)
    assert ch0.where("_change_type = 'insert'").count() == 3
    # overwrite: old files deleted, new inserted
    v3 = t.overwrite(_df(spark, [(9, "z")]))
    ch2 = t.read_changes(spark, v2, v3)
    got = {(r["k"], r["_change_type"]) for r in ch2.collect()}
    assert got == {(9, "insert"), (1, "delete"), (2, "delete"), (3, "delete")}
    # no change -> empty frame with the change column
    empty = t.read_changes(spark, v2, v2)
    assert empty.count() == 0 and "_change_type" in empty.columns


def test_refresh_counts_incremental_view_maintenance(spark, wh_root):
    """IVM over the changelog: the per-key count materialization,
    refreshed version-to-version from file-set deltas only, equals the
    full groupBy recompute at every snapshot — across appends, a
    same-rows compaction (net zero delta), and a key-removing
    overwrite (counts drop out at ≤ 0)."""
    from pyspark.sql import functions as F

    from crawler.warehouse import refresh_counts

    wh = Warehouse(wh_root)
    t = wh.table("ivm", SCHEMA)

    def full(v):
        return {
            (r["k"],): r["cnt"]
            for r in t.read(spark, v)
            .groupBy("k")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }

    def mat(df):
        return {(r["k"],): r["cnt"] for r in df.collect()}

    v1 = t.append(_df(spark, [(1, "a"), (1, "b"), (2, "c")]))
    m1 = refresh_counts(spark, t, ["k"], None, 0, v1)
    assert mat(m1) == full(v1) == {(1,): 2, (2,): 1}

    v2 = t.append(_df(spark, [(2, "d"), (3, "e")]))
    m2 = refresh_counts(spark, t, ["k"], m1, v1, v2)
    assert mat(m2) == full(v2) == {(1,): 2, (2,): 2, (3,): 1}

    # compaction: same rows rewritten into new files -> net zero delta
    v3 = t.overwrite(t.read(spark, v2).repartition(1))
    m3 = refresh_counts(spark, t, ["k"], m2, v2, v3)
    assert mat(m3) == full(v3) == mat(m2)

    # key-removing overwrite: deletes reverse inserts, key 1 drops out
    v4 = t.overwrite(_df(spark, [(2, "d"), (2, "x"), (3, "e")]))
    m4 = refresh_counts(spark, t, ["k"], m3, v3, v4)
    assert mat(m4) == full(v4) == {(2,): 2, (3,): 1}
