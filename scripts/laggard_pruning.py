"""Per-host-bucket frontier-pruning evidence (round-3): one host with a
huge crawl delay must NOT block range pruning for everyone else.

Scenario: host0 is fetched once in wave 0, then its robots crawl-delay
freezes it for 10^6 waves — its consumption cursor stays tiny while every
other host's cursor advances wave after wave. Under the round-2 design
(global min cursor) that single frozen cursor kept EVERY consumed frontier
range alive; with per-host-bucket cursors only host0's bucket retains its
ranges.

Prints the kept/prunable manifest-leaf counts under both policies plus the
laggard bucket's share of what per-bucket pruning keeps.

  python scripts/laggard_pruning.py [cpus] [pages]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from helix_spark.config import CrawlConfig  # noqa: E402
from helix_spark.plans.crawl import CrawlEngine  # noqa: E402
from helix_spark.session import get_spark  # noqa: E402
from helix_spark.sources.synthetic import gen_pages_spark  # noqa: E402

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
H = 256
WAVES = 6


def main():
    spark = get_spark(app_name="laggard-pruning", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    pages = gen_pages_spark(spark, PAGES, H)
    assets = spark.createDataFrame(
        [], "page_url string, asset_url string, content_type string, size long, status_code int, seq int"
    )
    robots = spark.createDataFrame(
        [(f"host{h}.test", [], 1_000_000 if h == 0 else 0) for h in range(H)],
        "host string, disallow_prefixes array<string>, crawl_delay_waves int",
    )
    cfg = CrawlConfig(
        seeds=["http://host0.test/p/0"],
        per_host_budget=PAGES // (H * WAVES),
        max_waves=WAVES, expected_urls=PAGES * 4, bloom_slices=16,
        seen_buckets=64, report_buckets=64, salt_partitions=CPUS,
        compact_every=0,  # prune manually below so both policies see the same state
    )
    eng = CrawlEngine(spark, cfg, tempfile.mkdtemp(prefix="laggard_"),
                      pages, assets, robots)
    eng.bootstrap_frontier(pages.select("url"))
    t0 = time.time()
    out = eng.run(resume=True)
    crawl_sec = round(time.time() - t0, 1)

    hs = eng.read_host_state()  # LWW-resolved if the table went LSM
    hb = F.pmod(F.xxhash64(F.col("host")), F.lit(cfg.frontier_host_buckets)).cast("int")
    lag_row = hs.filter(F.col("host") == "host0.test").select(
        hb.alias("hb"), "cursor").collect()[0]
    lag_bucket, lag_cursor = lag_row["hb"], lag_row["cursor"]
    global_min = hs.agg(F.min("cursor")).collect()[0][0]
    bucket_mins = eng._cursor_mins(hs)

    m = eng.wh._load_manifest("frontier")
    bits = m["range_bits"]
    leaves = [(rid, hbx) for rid, e in m["ranges"].items() for hbx in e]
    total = len(leaves)

    def kept_global(rid):
        return ((int(rid) + 1) << bits) - 1 > (global_min if global_min is not None else -1)

    def kept_bucket(rid, hbx):
        mn = bucket_mins.get(int(hbx))
        return mn is None or ((int(rid) + 1) << bits) - 1 > mn

    kept_g = sum(1 for rid, hbx in leaves if kept_global(rid))
    kept_b = [(rid, hbx) for rid, hbx in leaves if kept_bucket(rid, hbx)]
    in_lag = sum(1 for _, hbx in kept_b if int(hbx) == lag_bucket)

    print(json.dumps({
        "cpus": CPUS, "pages": PAGES, "waves": out.waves,
        "fetched": out.total_fetched, "crawl_sec": crawl_sec,
        "laggard_bucket": lag_bucket, "laggard_cursor": lag_cursor,
        "global_min_cursor": global_min,
        "frontier_leaves_total": total,
        "kept_under_global_min_policy": kept_g,
        "kept_under_per_bucket_policy": len(kept_b),
        "kept_in_laggard_bucket": in_lag,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
