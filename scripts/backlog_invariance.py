"""Wave-cost vs backlog-size evidence: with the cursor frontier (append +
manifest pruning, no rewrite), a politeness wave's wall time should depend
on the BATCH size, not on how many URLs sit queued behind it.

Bootstraps backlogs of several sizes, runs ONE wave with an identical
per-host budget (fixed batch ≈ budget × hosts), and prints wall time per
backlog. The pre-round-2 engine rewrote the whole frontier per wave —
O(backlog) — and showed clear growth here.

  python scripts/backlog_invariance.py [cpus] [budget]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from helix_spark.config import CrawlConfig  # noqa: E402
from helix_spark.plans.crawl import CrawlEngine  # noqa: E402
from helix_spark.session import get_spark  # noqa: E402
from helix_spark.sources.synthetic import gen_pages_spark  # noqa: E402

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
BACKLOGS = [1_000_000, 2_000_000, 4_000_000, 8_000_000]
H = 256


def one(spark, pages_n: int) -> dict:
    pages = gen_pages_spark(spark, pages_n, H)
    assets = spark.createDataFrame(
        [], "page_url string, asset_url string, content_type string, size long, status_code int, seq int"
    )
    robots = spark.createDataFrame(
        [(f"host{h}.test", [], 0) for h in range(H)],
        "host string, disallow_prefixes array<string>, crawl_delay_waves int",
    )
    cfg = CrawlConfig(
        seeds=["http://host0.test/p/0"], per_host_budget=BUDGET, max_waves=1,
        expected_urls=pages_n * 4, bloom_slices=16,
        seen_buckets=64, report_buckets=64, salt_partitions=CPUS,
    )
    eng = CrawlEngine(spark, cfg, tempfile.mkdtemp(prefix=f"bk{pages_n}_"),
                      pages, assets, robots)
    eng.bootstrap_frontier(pages.select("url"))
    t0 = time.time()
    out = eng.run(resume=True)
    return {
        "backlog": pages_n,
        "fetched": out.total_fetched,
        "wave_sec": round(time.time() - t0, 1),
    }


def main():
    spark = get_spark(app_name="backlog-invariance", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [one(spark, n) for n in BACKLOGS]
    base = rows[0]["wave_sec"]
    out = {
        "cpus": CPUS,
        "budget": BUDGET,
        "rows": rows,
        "wave_sec_ratio_8x_backlog": round(rows[-1]["wave_sec"] / base, 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
