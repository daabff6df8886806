"""Same-box paired A/B: round-3 snapshot vs current tree on the exact
bench.py crawl config (VERDICT r4 next-round #1 — is the 17% crawl_waves
shift a regression or environment?).

Each leg is its own process (one JVM per python process) running TWO
bench_crawl samples like bench.py does; legs alternate r3/head so box drift
hits both sides equally.

Usage:
  python scripts/crawl_ab_r3.py leg <repo_path>      # one leg, prints JSON
  python scripts/crawl_ab_r3.py all [rounds]         # alternate, summarize
"""

from __future__ import annotations

import json
import os
import sys

R3 = "/tmp/r3wt"
HEAD = "/root/repo"


def leg(repo: str) -> None:
    sys.path.insert(0, repo)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import bench
    from helix_spark.session import get_spark

    spark = get_spark(
        app_name="crawl-ab-r3",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=2 * bench.CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    samples = []
    for _ in range(2):
        sec, _ups, fetched = bench.bench_crawl(spark)
        samples.append(round(sec, 3))
    print(json.dumps({"repo": repo, "samples": samples,
                      "best": min(samples), "fetched": fetched}))


def main() -> None:
    if sys.argv[1] == "leg":
        leg(sys.argv[2])
        return
    # thin wrapper over scripts/ab_harness.py; each leg prints TWO crawl
    # samples — summarize on the leg's best sample
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ab_harness import alternate

    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    me = os.path.abspath(__file__)
    results = alternate(
        {"r3": [sys.executable, me, "leg", R3],
         "head": [sys.executable, me, "leg", HEAD]},
        rounds=rounds, timeout=900, key="best",
    )
    for name, recs in results.items():
        flat = [x for r in recs for x in r.get("samples", [])]
        if flat:
            print(f"{name}: best={min(flat):.1f}s "
                  f"median={sorted(flat)[len(flat)//2]:.1f}s samples={flat}")


if __name__ == "__main__":
    main()
