"""Versioned-snapshot parquet tables — an Iceberg-protocol stand-in.

The north_rule calls for Iceberg tables; this sandbox ships no Iceberg
runtime jar, so this module implements the same *protocol* on plain
parquet + manifest files, with the Iceberg concepts mapped 1:1:

  Iceberg concept        here
  ---------------        ----
  table snapshot         ``_meta/v{n}.json`` manifest (explicit file list)
  append (new manifest   ``Table.append`` — writes ONLY new data files,
   reuses old datafiles)  manifest = parent's files + new files
  overwrite              ``Table.overwrite`` — manifest lists only new files
  catalog pointer swap   ``Catalog.commit`` — single atomic ``os.replace``
   (atomic commit)        of ``_catalog.json`` naming every table's version
  time travel            ``Table.read(version=...)``
  partition spec         data files written via ``df.repartition(hash)`` so
                          each file holds one hash bucket of the key

Swapping to real Iceberg is mechanical: ``append → writeTo(t).append()``,
``Catalog.commit → a single WAP (write-audit-publish) cherry-pick``.

Why snapshots matter here: a crawl wave reads frontier/url_seen at the
catalog's committed versions, stages new versions for every table it
touches, and publishes them with ONE atomic catalog swap (lineage row
included) — a killed run can never observe a half-committed wave, which
is what makes resume exact (SURVEY.md §2.6 O8).
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _claim_write_json(path: str, obj: dict) -> bool:
    """Atomically create `path` with `obj`'s content; False if it exists.

    Unlike ``os.replace`` (which silently OVERWRITES a concurrent
    writer's file), ``os.link`` fails with EEXIST when the target is
    already present — the POSIX-atomic "claim this slot" primitive.
    Readers still never observe a partial file: content lands in the
    tmp file first, the link only exposes the finished bytes."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


class Table:
    """One versioned table. Data files are immutable; each version is a
    manifest (JSON) listing the parquet files visible in that snapshot."""

    def __init__(self, root: str, name: str, schema: T.StructType):
        self.root = os.path.join(root, name)
        self.name = name
        self.schema = schema
        os.makedirs(os.path.join(self.root, "_meta"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "_data"), exist_ok=True)

    # ---------------------------------------------------------- versions

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.root, "_meta", f"v{version:08d}.json")

    def latest_version(self) -> int:
        """Highest staged version (0 = empty table). The *committed*
        version is whatever the Catalog says — staging past it is safe.

        Only published ``v{N}.json`` manifests count: a concurrent
        stager's in-flight ``v{N}.json.tmp.<hex>`` claim file (or one
        orphaned by a kill between write and link) must not be taken
        for a staged version — ``_manifest`` on it would raise, and the
        claim-retry loop in ``_publish`` makes concurrent stagers a
        supported, exercised scenario."""
        metas = os.listdir(os.path.join(self.root, "_meta"))
        versions = [
            int(m[1:9])
            for m in metas
            if m.startswith("v") and m.endswith(".json") and m[1:9].isdigit()
        ]
        return max(versions, default=0)

    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "files": [], "rows": 0}
        with open(self._meta_path(version)) as f:
            return json.load(f)

    def files(self, version: int) -> list[str]:
        return self._manifest(version)["files"]

    def rows(self, version: int) -> int:
        return self._manifest(version).get("rows", 0)

    # -------------------------------------------------------------- read

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        files = self.files(v)
        if not files:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*files)

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Incremental changelog scan between two snapshots (the Iceberg
        incremental-read / changelog-scan analog): the rows a downstream
        consumer (e.g. a training-data ingest job) needs to process to
        move from snapshot ``from_version`` to ``to_version``, derived
        PURELY from the manifest file-set diff — data files are
        immutable, so a file present only in the newer snapshot is
        wholly inserted rows and a file present only in the older one is
        wholly deleted rows.  No row diffing, no data rewrite; the scan
        reads exactly the changed files (appends: only the new files,
        however large the table).

        Returns the table schema plus ``_change_type``
        ('insert' | 'delete').  Call it on two COMMITTED versions (the
        Catalog's) — staged-but-uncommitted versions in between never
        matter because the diff is endpoint-to-endpoint.
        """
        to_v = self.latest_version() if to_version is None else to_version
        old = set(self.files(from_version))
        new = set(self.files(to_v))
        out = None
        for files, kind in ((sorted(new - old), "insert"),
                            (sorted(old - new), "delete")):
            if not files:
                continue
            part = spark.read.schema(self.schema).parquet(*files).withColumn(
                "_change_type", F.lit(kind)
            )
            out = part if out is None else out.unionByName(part)
        if out is None:
            return spark.createDataFrame([], self.schema).withColumn(
                "_change_type", F.lit("insert")
            ).limit(0)
        return out

    def read_pruned(
        self,
        spark: SparkSession,
        key_col: str,
        keys,
        version: int | None = None,
    ) -> DataFrame:
        """Manifest-level file skipping — the Iceberg partition-pruned
        scan analog of ``overwrite_keyed``'s write side: read only the
        data files whose recorded key set intersects ``keys``.

        File granularity: a kept file may carry EXTRA keys beyond the
        requested set — callers must either filter or (like the bloom
        probe's shard cogroup) be keyed such that extra keys are inert.
        A key present in NO file behaves exactly as in a full read
        (zero rows for it).  Falls back to the full snapshot when the
        manifest carries no per-file key metadata, so callers can rely
        on it unconditionally.
        """
        v = self.latest_version() if version is None else version
        m = self._manifest(v)
        fk = m.get("file_keys")
        if fk is None or any(f not in fk for f in m["files"]):
            return self.read(spark, v)
        ks = set(keys)
        files = [f for f in m["files"] if ks.intersection(fk[f])]
        if not files:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*files)

    # ------------------------------------------------------------- write

    def _write_datafiles(self, df: DataFrame) -> tuple[list[str], int]:
        """Write df's rows as immutable parquet files, return (paths, rows)."""
        out = os.path.join(self.root, "_data", uuid.uuid4().hex)
        # align column order/casing with the declared schema
        df = df.select([c.name for c in self.schema.fields])
        df.write.mode("overwrite").parquet(out)
        files = sorted(
            os.path.join(out, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        if not files:
            shutil.rmtree(out, ignore_errors=True)
            return [], 0
        # cheap row counts from parquet footers; drop per-file empties
        # (explicitly repartitioned writes can leave empty partitions)
        import pyarrow.parquet as pq

        kept, rows = [], 0
        for f in files:
            n = pq.ParquetFile(f).metadata.num_rows
            if n == 0:
                os.unlink(f)
            else:
                kept.append(f)
                rows += n
        if rows == 0:
            shutil.rmtree(out, ignore_errors=True)
            return [], 0
        return kept, rows

    def _publish(self, manifest: dict) -> int:
        """Stage `manifest` at the next free version slot, atomically.

        Two concurrent stagers (the wave loop's frontier_adds append vs
        the streaming intake's) can both read latest = N and race for
        v = N+1; the claim-link fails for the loser — no manifest is
        ever silently clobbered — and the loser retries at the next
        slot.  Manifest CONTENT (parent, file list) is already fixed by
        the caller, so a retry only renumbers the slot."""
        while True:
            v = self.latest_version() + 1
            manifest["version"] = v
            if _claim_write_json(self._meta_path(v), manifest):
                return v

    def append(self, df: DataFrame, base_version: int | None = None) -> int:
        """Stage a new version = base's files + df's files. Returns it."""
        base = self.latest_version() if base_version is None else base_version
        new_files, new_rows = self._write_datafiles(df)
        parent = self._manifest(base)
        return self._publish(
            {
                "parent": base,
                "files": parent["files"] + new_files,
                "rows": parent.get("rows", 0) + new_rows,
            }
        )

    def overwrite(self, df: DataFrame) -> int:
        new_files, new_rows = self._write_datafiles(df)
        return self._publish(
            {"parent": None, "files": new_files, "rows": new_rows}
        )

    # ---- keyed snapshots (per-file key tracking → partial rewrites) ----
    #
    # For blob tables keyed by a low-cardinality column (the bloom
    # shards), recording each data file's key set in the manifest lets a
    # wave rewrite ONLY the files whose shards changed and carry every
    # other file forward untouched — the Iceberg overwrite-by-filter
    # analog.  Without this, every wave rewrites every shard (~24 GB per
    # wave at the 4096-shard scale knob) no matter how few changed.

    def _file_keys(self, files: list[str], key_col: str) -> dict[str, list]:
        import pyarrow.parquet as pq

        out = {}
        for f in files:
            out[f] = sorted(set(pq.read_table(f, columns=[key_col])[key_col].to_pylist()))
        return out

    def overwrite_keyed(self, df: DataFrame, key_col: str) -> int:
        """overwrite + record each data file's key set in the manifest."""
        new_files, new_rows = self._write_datafiles(df)
        return self._publish(
            {
                "parent": None,
                "files": new_files,
                "rows": new_rows,
                "file_keys": self._file_keys(new_files, key_col),
            }
        )

    def keys_needing_rewrite(self, version: int, changed: list) -> list | None:
        """Expand a changed-key set to file granularity: the union of key
        sets of every file holding at least one changed key.  Returns
        None when any file lacks key metadata (caller must rewrite the
        whole table once to establish it)."""
        m = self._manifest(version)
        fk = m.get("file_keys")
        if fk is None or any(f not in fk for f in m["files"]):
            return None
        changed_set = set(changed)
        out: set = set()
        for f in m["files"]:
            ks = fk[f]
            if changed_set.intersection(ks):
                out.update(ks)
        return sorted(out)

    def replace_keys(self, df: DataFrame, base_version: int, key_col: str) -> int:
        """Stage a new version: parent files holding any of df's keys are
        dropped, df's files appended, all other parent files carried
        forward BY REFERENCE (same paths, zero rewrite).  The caller must
        ensure df carries rows for EVERY key of every dropped file — use
        keys_needing_rewrite to expand the changed set to file
        granularity first."""
        import pyarrow.parquet as pq

        new_files, new_rows = self._write_datafiles(df)
        new_keys: set = set()
        nk = self._file_keys(new_files, key_col)
        for ks in nk.values():
            new_keys.update(ks)
        parent = self._manifest(base_version)
        fk = dict(parent.get("file_keys") or {})
        keep, dropped_rows = [], 0
        for f in parent["files"]:
            if set(fk.get(f, ())) & new_keys:
                dropped_rows += pq.ParquetFile(f).metadata.num_rows
                fk.pop(f, None)
            else:
                keep.append(f)
        fk.update(nk)
        return self._publish(
            {
                "parent": base_version,
                "files": keep + new_files,
                "rows": parent.get("rows", 0) - dropped_rows + new_rows,
                "file_keys": fk,
            }
        )

    def rebase_delta(self, staged: int, old_base: int, new_base: int) -> int:
        """Rebase a staged version onto a base that moved underneath it
        (optimistic concurrency, the Iceberg commit-retry analog).

        New manifest = files(staged) + (files(new_base) − files(old_base))
        — i.e. keep everything the stager produced AND everything a
        concurrent appender added since old_base.  Sound when the
        concurrent writer only APPENDS (the streaming intake): for an
        append staged off old_base this equals files(new_base) + the
        stager's new files; for an overwrite (compaction) it carries the
        concurrent appends into the rewritten snapshot."""
        if new_base == old_base:
            return staged
        staged_m = self._manifest(staged)
        old_files = set(self.files(old_base))
        delta = [f for f in self.files(new_base) if f not in old_files]
        delta_rows = 0
        if delta:
            import pyarrow.parquet as pq

            delta_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in delta)
        return self._publish(
            {
                "parent": staged,
                "files": staged_m["files"] + delta,
                "rows": staged_m.get("rows", 0) + delta_rows,
            }
        )


def refresh_counts(
    spark: SparkSession,
    table: "Table",
    key_cols: list[str],
    base_counts: DataFrame | None,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental view maintenance for a per-key COUNT materialization
    (the Iceberg/Materialize incremental-refresh analog): apply the
    changelog between two snapshots (``Table.read_changes`` — a pure
    manifest file-set diff) as +1/−1 deltas to the previous
    materialization instead of recomputing the aggregate from the full
    table.

    ``base_counts`` is the materialization at ``from_version``
    (schema: *key_cols, cnt) or None for an empty base.  Returns the
    materialization at ``to_version``: keys with a non-positive count
    drop out, so deletes fully reverse inserts.

    Scale: work is O(changed files), never O(table) — an append-mostly
    100 TB table refreshes a derived rollup by scanning only the new
    files; a compaction (overwrite that rewrites the same rows into new
    files) nets to zero delta per key and the result is unchanged.  One
    delta agg (map-side combined) + one full-outer join keyed the same
    way.
    """
    ch = table.read_changes(spark, from_version, to_version)
    delta = ch.groupBy(*key_cols).agg(
        F.sum(
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias("_delta")
    )
    if base_counts is None:
        base_counts = delta.select(
            *key_cols, F.lit(0).cast("long").alias("cnt")
        ).limit(0)
    merged = base_counts.join(delta, list(key_cols), "full_outer").select(
        *key_cols,
        (
            F.coalesce(F.col("cnt"), F.lit(0))
            + F.coalesce(F.col("_delta"), F.lit(0))
        ).alias("cnt"),
    )
    return merged.where(F.col("cnt") > 0)


class Catalog:
    """Atomic multi-table snapshot pointer (the Iceberg catalog analog).

    ``state()`` → {"wave": int, "tables": {name: version}, ...}.  A wave
    stages versions on any tables it likes, then publishes all of them
    with one ``commit`` — a single POSIX-atomic rename."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "_catalog.json")

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def state(self) -> dict:
        if not self.exists():
            return {"wave": -1, "tables": {}, "config": None, "stats": {}}
        with open(self.path) as f:
            return json.load(f)

    def version_of(self, table: str) -> int:
        return self.state()["tables"].get(table, 0)

    @contextlib.contextmanager
    def lock(self, timeout_s: float = 60.0):
        """Cross-process commit mutex (fcntl.flock on a persistent lock
        file) serializing read-modify-write commit sequences — the wave
        loop and the streaming intake both take it, so neither can
        clobber the other's frontier_adds pointer.

        flock is kernel-owned: a holder that dies (even SIGKILL mid-
        commit) releases the lock when its fd closes, so there is no
        stale-lock-break path — the hazard where two waiters unlink a
        lockfile concurrently, or unlink one a third process just
        acquired, cannot arise.  `timeout_s` only bounds how long a
        LIVE holder may starve this waiter before we raise."""
        lock_path = os.path.join(self.root, "_catalog.lock")
        fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
        deadline = time.monotonic() + timeout_s
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except BlockingIOError:
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"catalog lock held > {timeout_s}s by a live process"
                        )
                    time.sleep(0.02)
            yield
        finally:
            os.close(fd)  # closes → flock released atomically

    def commit(self, wave: int, table_versions: dict[str, int], **extra) -> None:
        st = self.state()
        st["wave"] = wave
        st["tables"] = {**st["tables"], **table_versions}
        for k, v in extra.items():
            st[k] = v
        _atomic_write_json(self.path, st)


class Warehouse:
    """Catalog + lazily-created tables under one root directory.

    table_format selects the snapshot backend: "native" (this module's
    JSON-manifest Table) or "iceberg" (crawler.icebergio.IcebergTable —
    REAL Iceberg v2 metadata: metadata.json + Avro manifest lists/
    manifests, identity-partitioned keyed snapshots).  Both expose the
    same version-int API, so the Catalog's multi-table atomic commit —
    the piece single-table Iceberg leaves to a service catalog's
    transaction — works unchanged on top of either."""

    def __init__(self, root: str, table_format: str = "native"):
        self.root = root
        self.table_format = table_format
        self.catalog = Catalog(root)
        self._tables: dict[str, object] = {}

    def table(self, name: str, schema: T.StructType):
        t = self._tables.get(name)
        if t is None:
            if self.table_format == "iceberg":
                from .icebergio import IcebergTable

                t = IcebergTable(self.root, name, schema)
            else:
                t = Table(self.root, name, schema)
            self._tables[name] = t
        return t

    def read_committed(
        self, spark: SparkSession, name: str, schema: T.StructType
    ) -> DataFrame:
        """Read a table at the version named by the last catalog commit —
        snapshot isolation for the wave loop."""
        return self.table(name, schema).read(spark, self.catalog.version_of(name))

    def expire(self, keep_last: int = 1) -> dict[str, dict[str, int]]:
        """Iceberg ``expire_snapshots`` analog: per table, keep the
        last ``keep_last`` manifests at-or-below the committed version
        plus EVERY manifest above it (uncommitted staging in flight must
        survive), delete the older manifests, then delete the data files
        those dropped manifests reference that no kept manifest still
        reaches.  Files referenced by NO manifest are never touched —
        a concurrent ``_write_datafiles`` lands its parquet before its
        manifest exists, and expiry must not eat it.

        Runs under the catalog lock so the committed pointer and the
        staged-version set cannot move mid-scan.  Returns, per table,
        {"manifests_dropped": n, "files_deleted": n}.

        Dispatches by on-disk layout: a ``_meta/`` directory is a native
        JSON-manifest table (handled inline below); a ``metadata/``
        directory is an Iceberg-backend table, delegated to
        ``IcebergTable.expire`` (same keep/drop rule, prunes snapshots
        from the kept metadata.json files and deletes unreferenced
        manifest-list/manifest avros + data files)."""
        report: dict[str, dict[str, int]] = {}
        with self.catalog.lock():
            committed = self.catalog.state()["tables"]
            for name in sorted(os.listdir(self.root)):
                meta_dir = os.path.join(self.root, name, "_meta")
                if not os.path.isdir(meta_dir):
                    ice_meta = os.path.join(self.root, name, "metadata")
                    if os.path.isdir(ice_meta):
                        t = self._tables.get(name)
                        if t is None:
                            from .icebergio import IcebergTable

                            t = IcebergTable(self.root, name, T.StructType())
                        rep = t.expire(
                            committed.get(name, 0), keep_last=keep_last
                        )
                        if rep["manifests_dropped"] or rep["files_deleted"]:
                            report[name] = rep
                    continue
                versions = sorted(
                    int(m[1:9])
                    for m in os.listdir(meta_dir)
                    if m.startswith("v") and m.endswith(".json")
                )
                cv = committed.get(name, 0)
                at_or_below = [v for v in versions if v <= cv]
                keep = set(at_or_below[-max(1, keep_last):]) | {
                    v for v in versions if v > cv
                }
                drop = [v for v in versions if v not in keep]
                if not drop:
                    continue

                def files_of(v: int) -> set[str]:
                    with open(os.path.join(meta_dir, f"v{v:08d}.json")) as f:
                        return set(json.load(f)["files"])

                reachable: set[str] = set()
                for v in keep:
                    reachable |= files_of(v)
                doomed: set[str] = set()
                for v in drop:
                    doomed |= files_of(v) - reachable
                for f in doomed:
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(f)
                    d = os.path.dirname(f)
                    with contextlib.suppress(OSError):  # rmdir only if empty
                        os.rmdir(d)
                for v in drop:
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(os.path.join(meta_dir, f"v{v:08d}.json"))
                report[name] = {
                    "manifests_dropped": len(drop),
                    "files_deleted": len(doomed),
                }
        return report
