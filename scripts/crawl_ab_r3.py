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
import subprocess
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
    print(json.dumps({"repo": repo, "samples": samples, "fetched": fetched}))


def main() -> None:
    if sys.argv[1] == "leg":
        leg(sys.argv[2])
        return
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results: dict[str, list[float]] = {R3: [], HEAD: []}
    for _ in range(rounds):
        for repo in (R3, HEAD):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "leg", repo],
                capture_output=True, text=True, timeout=900, cwd=repo,
            )
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if not lines:
                print(f"{repo}: FAILED\n{out.stderr[-1500:]}")
                continue
            rec = json.loads(lines[-1])
            results[repo].extend(rec["samples"])
            print(rec, flush=True)
    for repo, s in results.items():
        if s:
            print(f"{repo}: best={min(s):.1f}s median={sorted(s)[len(s)//2]:.1f}s samples={s}")


if __name__ == "__main__":
    main()
