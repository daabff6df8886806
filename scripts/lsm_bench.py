"""Wide-host bench leg: exercise the host_state LSM write path AT BENCH
SCALE (round-5 VERDICT #4). The 200k-page headline bench has ~64 hosts, so
the LSM regime (past host_state_lsm_min_hosts = 50k) was unit-tested but
never measured under load. This leg crawls a graph with H ≫ 50k hosts so
the table migrates flat → bucketed mid-crawl and every later wave appends
only the changed rows.

Reports per wave: wall seconds, host_state rows appended, and appended
parquet bytes — the O(changed hosts) evidence is rows/bytes ∝ wave batch
hosts, NOT ∝ total registered hosts.

Usage: python scripts/lsm_bench.py [pages] [hosts] [waves] [budget]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
H = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
WAVES = int(sys.argv[3]) if len(sys.argv) > 3 else 3
BUDGET = int(sys.argv[4]) if len(sys.argv) > 4 else 2
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def dir_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main():
    from pyspark.sql import functions as F

    from helix_spark.config import CrawlConfig
    from helix_spark.plans.crawl import CrawlEngine
    from helix_spark.session import get_spark
    from helix_spark.sources.synthetic import gen_pages_spark

    spark = get_spark(
        app_name="helix-lsm-bench", master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = gen_pages_spark(spark, PAGES, H)
    assets = spark.createDataFrame(
        [], "page_url string, asset_url string, content_type string, "
            "size long, status_code int, seq int",
    )
    # most hosts politeness-delayed after their first fetch: steady-state
    # waves then touch only the undelayed ~H/DELAY_MOD subset, which is what
    # makes "rows appended ∝ wave batch hosts ≪ registered hosts" observable
    # (the all-hosts-active regime legitimately appends ~all hosts — that IS
    # the changed set there)
    delay_mod = int(os.environ.get("HELIX_LSM_DELAY_MOD", "30"))
    robots = spark.createDataFrame(
        [(f"host{h}.test", [], 0 if h % delay_mod == 0 else 6) for h in range(H)],
        "host string, disallow_prefixes array<string>, crawl_delay_waves int",
    )
    cfg = CrawlConfig(
        seeds=["http://host0.test/p/0"],
        per_host_budget=BUDGET,
        max_waves=WAVES,
        expected_urls=PAGES * 4,
        bloom_slices=16,
        seen_buckets=32,
        report_buckets=32,
        salt_partitions=CPUS,
    )
    wh_dir = tempfile.mkdtemp(prefix="lsm_bench_")
    eng = CrawlEngine(spark, cfg, wh_dir, pages, assets, robots)
    eng.bootstrap_frontier(pages.select("url"))
    wave_walls = []
    total_fetched = 0
    # run wave-by-wave so per-wave wall is attributable (max_waves bumps)
    for w in range(WAVES):
        cfg.max_waves = w + 1
        t0 = time.time()
        out = eng.run(resume=True)
        wave_walls.append(round(time.time() - t0, 1))
        total_fetched += out.total_fetched

    hs_dir = os.path.join(wh_dir, "host_state")
    raw = eng.wh.read("host_state")
    per_wave_rows = {
        int(r["wave"]): int(r["n"])
        for r in raw.groupBy("wave").agg(F.count(F.lit(1)).alias("n")).collect()
    } if eng.wh.num_buckets("host_state") else {}
    # appended bytes per data dir, newest included; map dirs → waves is not
    # recorded, so report the dir-size list sorted by mtime (migration dir
    # is the big one, appends after it are the O(changed) evidence)
    data_dirs = sorted(
        (os.path.join(hs_dir, d) for d in os.listdir(hs_dir) if d.startswith("data-")),
        key=os.path.getmtime,
    )
    sizes_kb = [round(dir_bytes(d) / 1024, 1) for d in data_dirs]
    print(json.dumps({
        "pages": PAGES, "hosts": H, "waves": WAVES, "budget": BUDGET,
        "wave_walls_sec": wave_walls,
        "n_hosts_registered": eng.n_hosts,
        "lsm_buckets": eng.wh.num_buckets("host_state"),
        "host_state_rows_per_wave": per_wave_rows,
        "host_state_dir_kb_by_mtime": sizes_kb,
        "fetched": total_fetched,
    }))


if __name__ == "__main__":
    main()
