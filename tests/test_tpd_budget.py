"""Per-TPD admission budget (config.max_urls_per_tpd) — the crawl
quota that stops a mega-host from consuming the crawl (Heritrix
queue-budget analog).  Applied after first-wins dedup in discovery
order; dropped links are NOT marked seen; seeds bypass.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawler import synth
from crawler.config import CrawlConfig
from crawler.config import test_config as make_test_config
from crawler.loop import Crawl
from crawler.oracle import Oracle
from crawler.synth import _doc, _page
from tests.test_e2e_crawl import _assert_equivalent, _seen_urls


def _fixture():
    pages, docs = [], []

    def add(url, body):
        doc_id = f"doc:{url}"
        docs.append(_doc(doc_id, body))
        pages.append(_page(url, 200, None, doc_id))

    add(
        "http://quota.com/",
        " ".join(f'<a href="/l{i}">x</a>' for i in range(1, 6))
        + ' <a href="http://otherq.com/o1">y</a> <a href="http://otherq.com/o2">z</a>',
    )
    for i in range(1, 6):
        # l1 discovers l6 a wave later — the budget must already be spent
        body = '<a href="/l6">late</a>' if i == 1 else "<p>leaf</p>"
        add(f"http://quota.com/l{i}", body)
    add("http://quota.com/l6", "<p>leaf</p>")
    add("http://otherq.com/o1", "<p>leaf</p>")
    add("http://otherq.com/o2", "<p>leaf</p>")
    return pd.DataFrame(pages), pd.DataFrame(docs)


def test_budget_cuts_in_discovery_order(spark, wh_root):
    cfg = make_test_config(max_urls_per_tpd=3, max_waves=10)
    pages_pd, docs_pd = _fixture()
    seeds = ["http://quota.com/"]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd))
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)
    _assert_equivalent(spark, c, o)
    seen = _seen_urls(spark, c)
    # first three quota.com links by link_pos made it; l4-l6 were cut
    # (l6 because the budget was already spent when l1 was parsed)
    for u in ("http://quota.com/l1", "http://quota.com/l2", "http://quota.com/l3",
              "http://otherq.com/o1", "http://otherq.com/o2"):
        assert u in seen, u
    for u in ("http://quota.com/l4", "http://quota.com/l5", "http://quota.com/l6"):
        assert u not in seen, u


def test_budget_equivalence_multihost(spark, wh_root):
    cfg = CrawlConfig(
        per_domain_delay_ms=100, wave_ms=300, seed_url_seen=True,
        max_waves=12, bloom_shards=16, skew_salt_buckets=4,
        max_urls_per_tpd=5,
    )
    pages_pd, docs_pd = synth.multihost_fixture(
        n_hosts=10, pages_per_host=6, mega_host_pages=40
    )
    seeds = ["http://h000.com/p/0", "http://mega.com/p/0"]
    c = Crawl(spark, wh_root, cfg)
    c.init(seeds, synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd))
    c.run()
    o = Oracle(pages_pd, docs_pd, cfg).run(seeds)
    _assert_equivalent(spark, c, o)
    # the budget actually bit: no tpd admitted more than 5 beyond seeds
    per_tpd: dict[str, int] = {}
    for u in o.url_seen:
        if u.rstrip("/") not in {s.rstrip("/") for s in seeds}:
            t = u.split("://")[1].split("/")[0]
            per_tpd[t] = per_tpd.get(t, 0) + 1
    assert per_tpd and max(per_tpd.values()) <= 5
    assert any(v == 5 for v in per_tpd.values())  # non-vacuous


def test_budget_validation():
    with pytest.raises(ValueError, match="max_urls_per_tpd"):
        CrawlConfig(max_urls_per_tpd=0)
