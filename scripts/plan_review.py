"""Physical-plan audit — prints the `executedPlan` fragments BENCH/PLANS.md
cites, so the claims there are reproducible:

  python scripts/plan_review.py [sf_dir]

For each audited query it runs the plan and greps the formatted explain for
the load-bearing operators (broadcast joins, WindowGroupLimit partial,
pushed filters, pruned schemas)."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from helix_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

CHECKS = {
    # query name → (must-contain regexes, must-NOT-contain regexes)
    "seen_anti_join": ([r"BroadcastHashJoin .*LeftAnti"], []),
    # global (partitionless) top-k plans as TakeOrderedAndProject — a
    # distributed partial take-ordered that beats a WindowGroupLimit
    "topk_revenue_join": (
        [r"BroadcastHashJoin", r"TakeOrderedAndProject|WindowGroupLimit"],
        [],
    ),
    "region_rollup_join": ([r"BroadcastHashJoin"], []),
    "per_host_topk": ([r"WindowGroupLimit.*Partial"], []),
    "status_class_agg": ([r"HashAggregate"], []),
    "near_dup_pairs": ([r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"], [r"CartesianProduct"]),
    "minhash_lsh_pairs": ([], [r"CartesianProduct", r"BroadcastNestedLoopJoin"]),
    "embedding_topk": ([r"TakeOrderedAndProject|WindowGroupLimit"], []),
}


def main() -> int:
    import __spark_entry__ as e

    spark = get_spark(master="local[8]", shuffle_partitions=16,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    failures = 0
    for name, (must, must_not) in CHECKS.items():
        df = qs[name](spark, SF)
        qe = df._jdf.queryExecution()
        # executedPlan.toString names every physical operator (the formatted
        # explain elides WindowGroupLimit in Spark 4.1); append the formatted
        # form too for PushedFilters/ReadSchema lines
        plan = qe.executedPlan().toString() + qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        ok = True
        for pat in must:
            if not re.search(pat, plan):
                print(f"FAIL {name}: missing /{pat}/")
                ok = False
        for pat in must_not:
            if re.search(pat, plan):
                print(f"FAIL {name}: contains forbidden /{pat}/")
                ok = False
        if ok:
            hits = [
                ln.strip()
                for ln in plan.splitlines()
                if any(re.search(p, ln) for p in must)
            ][:4]
            print(f"PASS {name}: " + (" | ".join(hits) if hits else "clean"))
        else:
            failures += 1
    spark.stop()
    print(f"{len(CHECKS) - failures}/{len(CHECKS)} plan checks pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
