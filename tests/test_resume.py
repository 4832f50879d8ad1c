"""Kill-and-resume exactness (north_rule; the reference's recovery
contract from PersistentDuplicateFilterSpec journal/snapshot replay).

A run killed after wave k and resumed must produce byte-identical
final state to an uninterrupted run: same URL-seen set, same per-host
order, same lineage."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler import synth
from crawler.config import test_config as make_test_config
from crawler.loop import Crawl


def _fixture(spark):
    pages_pd, docs_pd = synth.test_server_fixture()
    return synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd)


def _final_state(c: Crawl):
    seen = sorted(
        r["url_canon"] for r in c._read("url_seen").select("url_canon").collect()
    )
    fetched = [
        (r["host"], r["wave"], r["fetch_ms"], r["url"])
        for r in c._read("fetched")
        .select("host", "wave", "fetch_ms", "url")
        .orderBy("host", "wave", "fetch_ms", "url")
        .collect()
    ]
    lineage = [
        tuple(r)
        for r in c._read("lineage").orderBy("wave", "partition_id").collect()
    ]
    return seen, fetched, lineage


def test_kill_and_resume_identical(spark, tmp_path):
    seeds = ["http://localhost:9090/crawl/1", "http://localhost:9090/links/1"]
    pages, docs = _fixture(spark)

    # uninterrupted reference run
    cfg = make_test_config(seed_url_seen=True, max_waves=40)
    c_ref = Crawl(spark, str(tmp_path / "ref"), cfg)
    c_ref.init(seeds, pages, docs)
    c_ref.run()

    # interrupted run: stop after 4 waves ("kill"), then resume in a NEW
    # Crawl instance that only sees the committed catalog
    cfg_k = make_test_config(seed_url_seen=True, max_waves=4)
    c1 = Crawl(spark, str(tmp_path / "kill"), cfg_k)
    c1.init(seeds, pages, docs)
    c1.run()
    assert c1.wh.catalog.state()["wave"] == 3  # committed through wave 3

    # stage some ORPHAN junk as a mid-wave kill would leave behind — the
    # resumed run must ignore it (appends are based on committed versions)
    c1._t("url_seen").append(
        spark.createDataFrame(
            [("http://junk.example.com/x", 123456789, 99)],
            "url_canon string, url_hash long, wave int",
        )
    )

    # expire old snapshots before resuming: resume must only need the
    # last committed catalog state (+ staged-above-commit versions), so
    # a vacuumed warehouse resumes byte-identically
    report = c1.wh.expire(keep_last=1)
    assert any(r["manifests_dropped"] > 0 for r in report.values())

    cfg_r = make_test_config(seed_url_seen=True, max_waves=40)
    c2 = Crawl(spark, str(tmp_path / "kill"), cfg_r)
    c2.run()  # resumes from the catalog, no re-init

    ref = _final_state(c_ref)
    got = _final_state(c2)
    assert got[0] == ref[0], "url_seen differs after resume"
    assert got[1] == ref[1], "per-host fetch order differs after resume"
    assert got[2] == ref[2], "lineage differs after resume"
    assert "http://junk.example.com/x" not in got[0]


def test_resume_noop_when_finished(spark, tmp_path):
    seeds = ["http://localhost:9090/links/1"]
    pages, docs = _fixture(spark)
    cfg = make_test_config(seed_url_seen=True, max_waves=40)
    c = Crawl(spark, str(tmp_path / "wh"), cfg)
    c.init(seeds, pages, docs)
    c.run()
    final_wave = c.wh.catalog.state()["wave"]
    # second run: frontier exhausted → no new waves committed
    c2 = Crawl(spark, str(tmp_path / "wh"), cfg)
    out = c2.run()
    assert c2.wh.catalog.state()["wave"] == final_wave
    assert len(out) <= 3  # only empty clock-advance waves, if any


def test_in_loop_expiry_bounds_manifests_and_preserves_state(spark, tmp_path):
    """cfg.expire_every_waves: the loop vacuums the warehouse as it
    runs — manifest history stays bounded and the final state is
    identical to an expiry-disabled run."""
    import os

    seeds = ["http://localhost:9090/crawl/1", "http://localhost:9090/links/1"]
    pages, docs = _fixture(spark)

    cfg_off = make_test_config(
        seed_url_seen=True, max_waves=12, expire_every_waves=0
    )
    c_off = Crawl(spark, str(tmp_path / "off"), cfg_off)
    c_off.init(seeds, pages, docs)
    c_off.run()

    cfg_on = make_test_config(
        seed_url_seen=True, max_waves=12, expire_every_waves=2,
        expire_keep_last=1,
    )
    c_on = Crawl(spark, str(tmp_path / "on"), cfg_on)
    c_on.init(seeds, pages, docs)
    c_on.run()

    assert _final_state(c_on) == _final_state(c_off)

    def manifest_counts(root):
        out = {}
        for t in sorted(os.listdir(root)):
            meta = os.path.join(root, t, "_meta")
            if os.path.isdir(meta):
                out[t] = sum(
                    1 for m in os.listdir(meta)
                    if m.startswith("v") and m.endswith(".json")
                )
        return out

    on_counts = manifest_counts(str(tmp_path / "on"))
    off_counts = manifest_counts(str(tmp_path / "off"))
    # expiry fired: every table's history is no longer the full log
    assert sum(on_counts.values()) < sum(off_counts.values())
    # bounded: at most keep_last at-or-below committed (+ nothing staged
    # after the final commit), modulo waves since the last expiry tick
    assert all(n <= 1 + 2 for n in on_counts.values()), on_counts
