"""N vs 4N scaling evidence (BASELINE.json north rule, sandboxed form).

Runs the IDENTICAL frontier-processing job — bootstrap a large URL backlog,
then politeness waves of select → verify → route → extract → admit →
commit — at local[8] and local[32] on the same deterministic input, and
reports throughput at both plus scaling efficiency
  eff = (urls_per_sec_32 / urls_per_sec_8) / (32/8).

Results go into BENCH/BASELINE.md. Usage:
  python scripts/scaling_bench.py [pages] [waves]
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

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
WAVES = int(sys.argv[2]) if len(sys.argv) > 2 else 2
N_CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
H = 256


def run_config(cpus: int) -> dict:
    spark = get_spark(
        app_name=f"helix-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = gen_pages_spark(spark, PAGES, H)
    assets = spark.createDataFrame(
        [], "page_url string, asset_url string, content_type string, size long, status_code int, seq int"
    )
    robots = spark.createDataFrame(
        [(f"host{h}.test", [], 0) for h in range(H)],
        "host string, disallow_prefixes array<string>, crawl_delay_waves int",
    )
    cfg = CrawlConfig(
        seeds=["http://host0.test/p/0"],
        per_host_budget=max(PAGES // (H * WAVES), 100),
        max_waves=WAVES,
        expected_urls=PAGES * 4,
        bloom_slices=16,
        seen_buckets=64,
        report_buckets=64,
        salt_partitions=cpus,
    )
    eng = CrawlEngine(spark, cfg, tempfile.mkdtemp(prefix=f"scale{cpus}_"), pages, assets, robots)
    t_boot = time.time()
    admitted = eng.bootstrap_frontier(pages.select("url"))
    boot_sec = time.time() - t_boot
    t0 = time.time()
    out = eng.run(resume=True)
    dt = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "bootstrap_admitted": admitted,
        "bootstrap_sec": round(boot_sec, 1),
        "fetched": out.total_fetched,
        "sec": round(dt, 1),
        "urls_per_sec": round(out.total_fetched / dt, 1),
        "waves": out.waves,
    }


def main():
    rN, r4N = run_config(N_CPUS), run_config(4 * N_CPUS)
    eff = (r4N["urls_per_sec"] / rN["urls_per_sec"]) / 4.0
    out = {"pages": PAGES, "waves": WAVES,
           f"local{N_CPUS}": rN, f"local{4 * N_CPUS}": r4N,
           "scaling_efficiency": round(eff, 3)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
