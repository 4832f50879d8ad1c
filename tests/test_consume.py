"""MultiInstanceSpec parity (integration/MultiInstanceSpec.scala:16-47):
two instances of one app jointly consume the fetched stream — every
item delivered exactly once across them, no more; a second app sees the
full stream independently."""

from __future__ import annotations

from crawler import synth
from crawler.config import test_config as make_test_config
from crawler.consume import FetchedConsumer
from crawler.loop import Crawl
from crawler.warehouse import Warehouse


def test_two_instances_share_one_delivery(spark, wh_root):
    # 1000ms wave / 100ms delay → ~10 fetches per wave on the single
    # localhost TPD: the 40 seeds drain over ~4 waves, so the two
    # instances' alternating polls genuinely split the stream
    cfg = make_test_config(seed_url_seen=True, max_waves=8, wave_ms=1000,
                      status_filter=True)
    pages_pd, docs_pd = synth.test_server_fixture()
    c = Crawl(spark, wh_root, cfg)
    # the reference's 40 flat pages, seeded like MultiInstanceSpec
    seeds = [f"http://localhost:9090/{i}" for i in range(1, 41)]
    c.init(seeds, synth.pages_df(spark, pages_pd), synth.documents_df(spark, docs_pd))

    wh = Warehouse(wh_root)
    a1 = FetchedConsumer(wh, "MultiInstanceSpec", "instance-1")
    a2 = FetchedConsumer(wh, "MultiInstanceSpec", "instance-2")
    got1: list[str] = []
    got2: list[str] = []
    wave = 0
    while c.pending_count() > 0 and wave < cfg.max_waves:
        c.run_wave(wave)
        # instances alternate polls — a poll claims whatever committed
        # files are still unclaimed, so the stream splits between them
        poller, other = (a1, got1) if wave % 2 == 0 else (a2, got2)
        other += [r["url"] for r in poller.poll(spark).select("url").collect()]
        wave += 1

    fetched_all = sorted(r["url"] for r in c._read("fetched").select("url").collect())
    assert sorted(seeds) == sorted(set(fetched_all))  # 40 pages, each fetched
    combined = got1 + got2
    # exactly once across the two instances: no duplicates, full coverage
    assert len(combined) == len(set(combined))
    assert sorted(combined) == fetched_all
    # interleaving actually split the stream (both instances got items)
    assert got1 and got2

    # a different app id sees the whole stream again, independently
    b = FetchedConsumer(wh, "otherApp", "instance-1")
    got_b = [r["url"] for r in b.poll(spark).select("url").collect()]
    assert sorted(got_b) == fetched_all
