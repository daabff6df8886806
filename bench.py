"""Benchmark harness — prints ONE JSON line the driver records as BENCH_r{N}.json.

Two components:
1. headline relational/pipeline queries from __spark_entry__ at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
2. the crawl engine itself on a spark-generated synthetic web graph —
   frontier URLs processed/sec (the BASELINE.json metric)

Runs on local[$SPARK_GRAFT_CPUS]. The N-vs-4N scaling-efficiency evidence
(local[8] vs local[32]) is produced by scripts/scaling_bench.py and recorded
in BENCH/BASELINE.md — this file reports single-config throughput.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helix_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "status_class_agg",
    "topk_revenue_join",
    "region_rollup_join",
    "per_host_topk",
    "first_wins_dedup",
    "sessionize",
    "url_canonicalize",
    "minhash_signature",
    "ngram_jaccard",
    "near_dup_pairs",
    "embedding_near_dup",
    "simhash",
    "embedding_topk",
    "exact_dedup",
    # round-4 additions: the end-to-end dedup decision, the Hamming-space
    # near-dup (collapse guard on), and the integer-exact ANN path
    "dedup_keep_best",
    "simhash_near_dup",
    "lsh_ann_topk",
]

CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "200000"))
CRAWL_WAVES = int(os.environ.get("SPARK_GRAFT_CRAWL_WAVES", "3"))


def bench_queries(spark) -> dict[str, float]:
    from helix_spark.entry_queries import QUERIES

    times = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        fn(spark, SF_DIR).collect()  # warm (plan compile + file listing)
        t0 = time.time()
        fn(spark, SF_DIR).collect()
        times[name] = round(time.time() - t0, 3)
    return times


def bench_crawl(spark) -> tuple[float, float, int]:
    """Frontier throughput (the BASELINE.json metric shape): bootstrap a
    CRAWL_PAGES-URL frontier backlog over a spark-generated page graph, then
    run CRAWL_WAVES politeness waves (select → verify → route → extract →
    admit → commit) → URLs verified per second."""
    from helix_spark.config import CrawlConfig
    from helix_spark.plans.crawl import CrawlEngine
    from helix_spark.sources.synthetic import gen_pages_spark

    H = 64
    pages = gen_pages_spark(spark, CRAWL_PAGES, H)
    assets = spark.createDataFrame(
        [], "page_url string, asset_url string, content_type string, size long, status_code int, seq int"
    )
    robots = spark.createDataFrame(
        [(f"host{h}.test", [], 0) for h in range(H)],
        "host string, disallow_prefixes array<string>, crawl_delay_waves int",
    )
    per_host = max(CRAWL_PAGES // (H * CRAWL_WAVES), 100)
    cfg = CrawlConfig(
        seeds=["http://host0.test/p/0"],
        per_host_budget=per_host,
        max_waves=CRAWL_WAVES,
        expected_urls=CRAWL_PAGES * 4,
        bloom_slices=16,
        seen_buckets=32,
        report_buckets=32,
        salt_partitions=CPUS,
    )
    wh = tempfile.mkdtemp(prefix="bench_crawl_")
    eng = CrawlEngine(spark, cfg, wh, pages, assets, robots)
    eng.bootstrap_frontier(pages.select("url"))
    t0 = time.time()
    out = eng.run(resume=True)
    dt = time.time() - t0
    return dt, out.total_fetched / dt if dt > 0 else 0.0, out.total_fetched


def main():
    spark = get_spark(
        app_name="helix-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Crawl FIRST (fresh JVM — round 2's recorded headline was corrupted by
    # running it after 14 heavy queries in the same JVM), and BEST-OF-2 with
    # both samples emitted so one noisy sample can't misreport the metric
    # by 2× again (VERDICT r2 "What's wrong" #3).
    crawl_samples = []
    fetched = 0
    for _ in range(2):
        crawl_sec, _ups, fetched = bench_crawl(spark)
        crawl_samples.append(round(crawl_sec, 3))
    best_sec = min(crawl_samples)
    urls_per_sec = fetched / best_sec if best_sec > 0 else 0.0
    qtimes = bench_queries(spark)
    total = round(sum(qtimes.values()) + sum(crawl_samples), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "frontier_urls_per_sec",
        "value": round(urls_per_sec, 1),
        "unit": "urls/sec",
        "queries": {**qtimes, "crawl_waves": best_sec},
        "crawl_samples_sec": crawl_samples,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl_pages": CRAWL_PAGES,
        "crawl_urls_fetched": fetched,
        "total_sec": total,
        "cpus": CPUS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
