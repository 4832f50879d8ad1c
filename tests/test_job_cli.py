"""spark-submit entrypoint (crawler.job) — the north_rule ship-shape:
`--py-files crawler.zip` packaging plus the run/resume CLI surface,
exercised in-process (same code path spark-submit drives)."""

from __future__ import annotations

import zipfile

from crawler import job
from crawler.warehouse import Warehouse


def test_make_zip_packages_every_module(tmp_path):
    out = job.make_zip(str(tmp_path / "crawler.zip"))
    with zipfile.ZipFile(out) as z:
        names = set(z.namelist())
    for mod in ("loop", "politeness", "dedup", "warehouse", "psl", "consume",
                "streaming", "export", "extract", "frontier", "job"):
        assert f"crawler/{mod}.py" in names


def test_job_run_and_resume(spark, wh_root, capsys):
    """First invocation inits + crawls; a second invocation on the same
    warehouse resumes from the committed catalog (no re-init, counts
    monotone)."""
    argv = [
        "--warehouse", wh_root,
        "--seeds", "http://localhost:9090/crawl/1",
        "--fixture", "test-server",
        "--max-waves", "5",
        "--per-domain-delay-ms", "100",
        "--wave-ms", "100",
    ]
    assert job.main(argv) == 0
    wh = Warehouse(wh_root)
    st1 = wh.catalog.state()
    assert st1["stats"]["fetched"] > 0 and st1["wave"] >= 0

    # resume: catalog exists → init skipped, waves continue past st1
    assert job.main(argv + ["--max-waves", "9"]) == 0
    st2 = Warehouse(wh_root).catalog.state()
    assert st2["wave"] > st1["wave"]
    assert st2["stats"]["fetched"] >= st1["stats"]["fetched"]
