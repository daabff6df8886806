"""spark-submit entry point for the crawl engine (north rule: the job runs
via ``spark-submit --py-files`` on multi-executor clusters).

Package and submit:

    python scripts/package.py                        # → dist/helix_spark.zip
    spark-submit --py-files dist/helix_spark.zip \
        scripts/submit_crawl.py \
        --pages 1000000 --hosts 256 --waves 4 --budget 1000 \
        --warehouse /tmp/helix_wh [--resume]

On a real cluster the same invocation works with ``--master yarn|k8s://...``
and executor sizing flags; locally it uses the session defaults. The job
bootstraps (or resumes) a frontier over a deterministic synthetic page graph
and prints one JSON result line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--budget", type=int, default=500)
    ap.add_argument("--warehouse", default="/tmp/helix_wh")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", default=None, help="seed URL (default: page 0)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from helix_spark.config import CrawlConfig
    from helix_spark.plans.crawl import CrawlEngine
    from helix_spark.sources.synthetic import gen_pages_spark

    # spark-submit owns the session config; fall back to a local session
    spark = SparkSession.builder.appName("helix-spark-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pages = gen_pages_spark(spark, args.pages, args.hosts)
    assets = spark.createDataFrame(
        [], "page_url string, asset_url string, content_type string, size long, status_code int, seq int"
    )
    robots = spark.createDataFrame(
        [(f"host{h}.test", [], 0) for h in range(args.hosts)],
        "host string, disallow_prefixes array<string>, crawl_delay_waves int",
    )
    cfg = CrawlConfig(
        seeds=[args.seed or "http://host0.test/p/0"],
        per_host_budget=args.budget,
        max_waves=args.waves,
        expected_urls=args.pages * 4,
        salt_partitions=spark.sparkContext.defaultParallelism,
    )
    eng = CrawlEngine(spark, cfg, args.warehouse, pages, assets, robots)
    if not args.resume:
        eng.bootstrap_frontier(pages.select("url"))
    t0 = time.time()
    out = eng.run(resume=True)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "fetched": out.total_fetched,
                "waves": out.waves,
                "aborted": out.aborted,
                "sec": round(dt, 1),
                "urls_per_sec": round(out.total_fetched / dt, 1) if dt else 0,
                "warehouse": args.warehouse,
            }
        )
    )


if __name__ == "__main__":
    main()
