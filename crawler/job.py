"""spark-submit entrypoint (SURVEY.md §3.2; north_rule: "ships as
spark-submit --py-files on a multi-executor cluster").

Usage:
    # package the engine
    python -m crawler.job --make-zip /tmp/crawler.zip

    # run a crawl (local or against a cluster master)
    spark-submit --py-files /tmp/crawler.zip $(python -c 'import crawler.job, inspect; print(inspect.getfile(crawler.job))') \
        --warehouse /data/crawl_wh \
        --seeds http://localhost:9090/crawl/1 \
        --fixture test-server --max-waves 20

Resume is the default: if the warehouse catalog exists, `init` is
skipped and the loop continues from the last committed wave (the
reference's journal-replay recovery, DuplicateFilter.scala:118-124,
expressed as snapshot reads).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def make_zip(out_path: str) -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for fn in sorted(os.listdir(pkg_dir)):
            if fn.endswith(".py"):
                z.write(os.path.join(pkg_dir, fn), arcname=f"crawler/{fn}")
    return out_path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="PySpark crawl engine")
    p.add_argument("--make-zip", metavar="PATH", help="write crawler.zip and exit")
    p.add_argument("--warehouse", help="warehouse root directory")
    p.add_argument("--seeds", nargs="*", default=[], help="seed URLs")
    p.add_argument("--fixture", choices=["test-server", "multihost"],
                   default="test-server", help="synthetic web fixture")
    p.add_argument("--max-waves", type=int, default=100)
    p.add_argument("--max-fetched", type=int, default=None)
    p.add_argument("--per-domain-delay-ms", type=int, default=100)
    p.add_argument("--wave-ms", type=int, default=100)
    p.add_argument("--fetch-robots", action="store_true")
    p.add_argument("--bloom-shards", type=int, default=64)
    p.add_argument("--table-format", choices=["native", "iceberg"],
                   default="native",
                   help="state-table backend: warehouse JSON manifests "
                        "or real Iceberg v2 metadata (crawler.icebergio)")
    args = p.parse_args(argv)

    if args.make_zip:
        print(make_zip(args.make_zip))
        return 0
    if not args.warehouse or not args.seeds:
        p.error("--warehouse and --seeds are required to run a crawl")

    from crawler import synth
    from crawler.config import CrawlConfig
    from crawler.loop import Crawl
    from crawler.session import get_spark

    spark = get_spark("crawler-job")
    cfg = CrawlConfig(
        per_domain_delay_ms=args.per_domain_delay_ms,
        wave_ms=args.wave_ms,
        max_waves=args.max_waves,
        max_fetched=args.max_fetched,
        fetch_robots=args.fetch_robots,
        bloom_shards=args.bloom_shards,
        table_format=args.table_format,
    )
    c = Crawl(spark, args.warehouse, cfg)
    if not c.wh.catalog.exists():
        if args.fixture == "test-server":
            pages_pd, docs_pd = synth.test_server_fixture()
        else:
            pages_pd, docs_pd = synth.multihost_fixture()
        c.init(args.seeds, synth.pages_df(spark, pages_pd),
               synth.documents_df(spark, docs_pd))
    metrics = c.run(quiet=False)
    st = c.wh.catalog.state()
    print(json.dumps({
        "waves": len(metrics),
        "final_wave": st["wave"],
        "fetched": st["stats"]["fetched"],
        "bytes": st["stats"]["bytes"],
        "pending": c.pending_count(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
