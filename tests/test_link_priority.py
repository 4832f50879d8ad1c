"""Frontier scoring (config.link_priority) — the north rule's
"score-ordered within partition" over the per-TPD queues.

The reference's frontier is pure FIFO (RabbitMQ per-TPD queues,
FrontierThrottler.scala:43), so "none" is reference parity; "depth" and
"indegree" are north-rule scoring modes.  Every mode must stay fully
equivalent to the reference-semantics oracle (the oracle mirrors the
scorer), and the targeted fixtures pin that the score actually changes
the dequeue order the way it claims.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawler import synth
from crawler.config import CrawlConfig
from crawler.config import test_config as make_test_config
from crawler.loop import Crawl
from crawler.oracle import Oracle
from tests.test_e2e_crawl import _assert_equivalent


def _run_both(spark, wh_root, seeds, cfg, pages_pd, docs_pd):
    pages = synth.pages_df(spark, pages_pd)
    docs = synth.documents_df(spark, docs_pd)
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, pages, docs)
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)
    _assert_equivalent(spark, c, o)
    return c, o


def _hub_fixture():
    """One host; the root page links /solo once (first) and /hub three
    times.  FIFO discovers solo first; indegree scores hub 3 vs 1."""
    pages, docs = [], []
    body = (
        '<a href="/solo">s</a>'
        '<a href="/hub">h</a><a href="/hub">h</a><a href="/hub">h</a>'
    )
    docs.append(synth._doc("doc:root", body))
    pages.append(synth._page("http://h.com/root", 200, None, "doc:root"))
    for p in ("solo", "hub"):
        docs.append(synth._doc(f"doc:{p}", ""))
        pages.append(synth._page(f"http://h.com/{p}", 200, None, f"doc:{p}"))
    return pd.DataFrame(pages), pd.DataFrame(docs)


@pytest.mark.parametrize("mode,first_after_root", [
    ("none", "http://h.com/solo"),       # FIFO: discovery order
    ("indegree", "http://h.com/hub"),    # 3 references beat 1
])
def test_indegree_orders_hub_first(spark, wh_root, mode, first_after_root):
    pages_pd, docs_pd = _hub_fixture()
    cfg = make_test_config(seed_url_seen=True, max_waves=8, link_priority=mode)
    c, o = _run_both(
        spark, wh_root, ["http://h.com/root"], cfg, pages_pd, docs_pd
    )
    order = [u for _, _, u in o.order_per_host["h.com"]]
    assert order[0] == "http://h.com/root"
    assert order[1] == first_after_root
    assert set(order) == {
        "http://h.com/root", "http://h.com/solo", "http://h.com/hub"
    }


def _chain_fixture(n=5):
    """x0 → x1 → ... → x{n-1}, one host."""
    pages, docs = [], []
    for k in range(n):
        nxt = f'<a href="/x{k + 1}">n</a>' if k < n - 1 else ""
        docs.append(synth._doc(f"doc:x{k}", nxt))
        pages.append(synth._page(f"http://h.com/x{k}", 200, None, f"doc:x{k}"))
    return pd.DataFrame(pages), pd.DataFrame(docs)


@pytest.mark.parametrize("mode,wave3_url", [
    # FIFO: the wave-3 dequeue is the chain's next hop (lower seq)
    ("none", "http://h.com/x2"),
    # depth: the wave-3 re-seed (depth 0) outranks the depth-2 hop
    ("depth", "http://h.com/x0"),
])
def test_depth_prefers_shallow_reseed(spark, wh_root, mode, wave3_url):
    pages_pd, docs_pd = _chain_fixture()
    cfg = make_test_config(
        seed_url_seen=False, max_waves=7, link_priority=mode,
        reseed_every_waves=3,
    )
    c, o = _run_both(
        spark, wh_root, ["http://h.com/x0"], cfg, pages_pd, docs_pd
    )
    by_wave = {w: u for w, _, u in o.order_per_host["h.com"]}
    assert by_wave[3] == wave3_url


@pytest.mark.parametrize("mode", ["depth", "indegree"])
def test_scored_multihost_equivalence(spark, wh_root, mode):
    """Scored modes stay oracle-equivalent on the skewed Zipf graph
    (mega-host + 10 small hosts), not just the targeted fixtures."""
    cfg = CrawlConfig(
        per_domain_delay_ms=100, wave_ms=300, seed_url_seen=True,
        max_waves=12, bloom_shards=8, skew_salt_buckets=4,
        link_priority=mode,
    )
    pages_pd, docs_pd = synth.multihost_fixture(
        n_hosts=10, pages_per_host=5, mega_host_pages=40, seed=307
    )
    _run_both(
        spark, wh_root,
        ["http://h000.com/p/0", "http://mega.com/p/0"],
        cfg, pages_pd, docs_pd,
    )


def test_link_priority_validation():
    with pytest.raises(ValueError):
        CrawlConfig(link_priority="pagerank")
