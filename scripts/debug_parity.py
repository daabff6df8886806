import sys
import tempfile
import time

from helix_spark.config import CrawlConfig
from helix_spark.plans.crawl import CrawlEngine
from helix_spark.plans.oracle import SerialOracle
from helix_spark.session import get_spark
from helix_spark.sources import synthetic

N, H = int(sys.argv[1]) if len(sys.argv) > 1 else 60, 6
spark = get_spark(master="local[4]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
pages_pd = synthetic.gen_pages_py(N, H)
assets_pd = synthetic.gen_assets_py(N, H, 16)
robots_pd = synthetic.gen_robots_py(H)
cfg = CrawlConfig(seeds=["http://host0.test/p/0"], per_host_budget=3, max_waves=40,
                  expected_urls=10000, bloom_slices=4, seen_buckets=8, report_buckets=8)
oracle = SerialOracle(cfg, pages_pd, assets_pd, robots_pd).run()
print("ORACLE: fetches", len(oracle.crawl_order), "seen", len(oracle.seen),
      "report", len(oracle.report), "waves", oracle.waves, flush=True)

t0 = time.time()
eng = CrawlEngine(spark, cfg, tempfile.mkdtemp(), spark.createDataFrame(pages_pd),
                  spark.createDataFrame(assets_pd), spark.createDataFrame(robots_pd))
out = eng.run()
t1 = time.time()
print(f"ENGINE: fetched {out.total_fetched} waves {out.waves} in {t1-t0:.1f}s "
      f"({(t1-t0)/max(out.waves,1):.1f}s/wave)", flush=True)
eng_order = [(r["wave"], r["url"]) for r in eng.wh.read("crawl_log").orderBy("wave", "priority").collect()]
print("order match:", eng_order == oracle.crawl_order, len(eng_order), len(oracle.crawl_order))
if eng_order != oracle.crawl_order:
    for i, (a, b) in enumerate(zip(eng_order, oracle.crawl_order)):
        if a != b:
            print("  first diff at", i, "engine:", a, "oracle:", b)
            break
seen = {r["key"]: r["status_code"] for r in eng.read_seen().collect()}
print("seen match:", seen == oracle.seen, len(seen), len(oracle.seen))
if seen != oracle.seen:
    n = 0
    for k in sorted(set(oracle.seen) | set(seen)):
        if oracle.seen.get(k, "MISS") != seen.get(k, "MISS"):
            print("  ", k, "oracle:", oracle.seen.get(k, "MISS"), "engine:", seen.get(k, "MISS"))
            n += 1
            if n > 8:
                break
rep = {r["verified_url"]: (r["parent_url"], r["is_internal"], r["resource_type"], r["status_code"])
       for r in eng.read_report().collect()}
orep = {k: (v["parent_url"], v["is_internal"], v["resource_type"], v["status_code"])
        for k, v in oracle.report.items()}
print("report match:", rep == orep, len(rep), len(orep))
if rep != orep:
    n = 0
    for k in sorted(set(rep) | set(orep)):
        if rep.get(k) != orep.get(k):
            print("  ", k, "engine:", rep.get(k), "oracle:", orep.get(k))
            n += 1
            if n > 8:
                break
