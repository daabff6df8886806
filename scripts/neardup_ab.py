"""A/B: near_dup_pairs share_explode=True (materialize one corpus-wide
shingle explode, reuse for signatures + verify) vs False (stream the
signature explode through the map-side-combining agg, re-explode CANDIDATE
docs only for verify).

The two plans are bit-identical in output (oracle-pinned); the question is
cost by regime. The battery corpus is dup-HEAVY (~10 copies/distinct text →
candidates ≈ corpus); a second leg thins the candidate set by dropping the
replica structure (distinct texts only → candidates ≪ corpus) to expose the
sparse regime the 100 TB design point lives in.

Usage: python scripts/neardup_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from helix_spark.session import get_spark  # noqa: E402

sys.path.insert(0, "/root/repo/scripts")
from ab_harness import steal_window  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    from helix_spark.entry_queries import NEAR_DUP_CAP
    from helix_spark.operators.textdedup import near_dup_pairs

    spark = get_spark(app_name="neardup-ab", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # sparse-regime corpus: one doc per distinct text (candidates ≪ corpus)
    sparse = (
        docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text")
        .localCheckpoint()
    )
    corpora = {"dup-heavy": docs, "sparse": sparse}
    for cname, corpus in corpora.items():
        n = corpus.count()
        for r in range(ROUNDS):
            for shared in (True, False):
                with steal_window() as w:
                    t0 = time.time()
                    got = near_dup_pairs(
                        corpus, k=8, bands=4, threshold=0.2,
                        max_bucket_size=NEAR_DUP_CAP, share_explode=shared,
                    ).count()
                    dt = time.time() - t0
                print(
                    f"{cname} n={n} round={r} share_explode={shared}: "
                    f"{dt:.2f}s pairs={got} steal={w.steal_pct}%",
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
