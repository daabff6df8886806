"""Time-vs-scale evidence for the text/ANN dedup family (VERDICT r4 #7).

Builds sf0.2 / sf0.5 / sf1 variants of the documents + embeddings tables by
replicating the driver-provided sf0.1 parquet with disjoint doc ids and a
per-replica text suffix (so replicas are near-dup-NEUTRAL: the suffix changes
their shingle sets, keeping cluster structure comparable across scales
instead of exploding every doc into a 10-member exact-dup cluster), then
times the bucketed pipelines at each scale on local[32].

Also demonstrates the guarded quadratic twin refusing at scale:
ngram_jaccard's assert_max_docs fires at sf≥0.5 — that refusal IS the
scale-safety evidence (the bucketed near_dup_pairs path keeps running).

Output: one JSON line per (query, sf) plus a summary table for
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from helix_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = {0.1: 1, 0.2: 2, 0.5: 5, 1.0: 10}


def build_scaled(spark, out_root: str) -> dict[float, str]:
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    embs = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_docs = docs.count()
    n_embs = embs.count()
    dirs: dict[float, str] = {}
    for sf, reps in REPLICAS.items():
        d = os.path.join(out_root, f"sf{sf}")
        if reps == 1:
            dirs[sf] = BASE
            continue
        rep_docs = None
        rep_embs = None
        for r in range(reps):
            dd = docs.select(
                (F.col("doc_id") + r * n_docs).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{r}" if r else "")).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
            ee = embs.select(
                (F.col("vec_id") + r * n_embs).alias("vec_id"),
                *[c for c in embs.columns if c != "vec_id"],
            )
            rep_docs = dd if rep_docs is None else rep_docs.unionByName(dd)
            rep_embs = ee if rep_embs is None else rep_embs.unionByName(ee)
        os.makedirs(d, exist_ok=True)
        rep_docs.repartition(CPUS).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rep_embs.repartition(CPUS).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        for t in "region nation customer supplier part orders lineitem events".split():
            src = f"{BASE}/{t}.parquet"
            dst = f"{d}/{t}.parquet"
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
        dirs[sf] = d
    return dirs


QUERIES = [
    "exact_dedup",
    "minhash_signature",
    "near_dup_pairs",
    "simhash_near_dup",
    "embedding_topk",
    "lsh_ann_topk",
    "dedup_keep_best",
]


def main() -> None:
    spark = get_spark(
        app_name="sf-scaling", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_root = tempfile.mkdtemp(prefix="sf_scale_")
    dirs = build_scaled(spark, out_root)

    from helix_spark.entry_queries import QUERIES as QMAP

    results: dict[str, dict[float, float]] = {}
    for sf in sorted(dirs):
        sf_dir = dirs[sf]
        for name in QUERIES:
            fn = QMAP[name]
            try:
                fn(spark, sf_dir).collect()  # warm
                t0 = time.time()
                fn(spark, sf_dir).collect()
                dt = round(time.time() - t0, 2)
            except Exception as e:  # guarded twins refuse at scale
                dt = f"REFUSED: {str(e)[:80]}"
            results.setdefault(name, {})[sf] = dt
            print(json.dumps({"query": name, "sf": sf, "sec": dt}), flush=True)
        # the guarded quadratic twin: expect the guard to FIRE past ~20k docs
        try:
            QMAP["ngram_jaccard"](spark, sf_dir).collect()
            guard = "ran"
        except ValueError as e:
            guard = f"guard fired: {str(e)[:60]}"
        print(json.dumps({"query": "ngram_jaccard", "sf": sf, "sec": guard}), flush=True)
        results.setdefault("ngram_jaccard", {})[sf] = guard

    print("\n| query | " + " | ".join(f"sf{sf}" for sf in sorted(dirs)) + " |")
    print("|---|" + "---|" * len(dirs))
    for name, by_sf in results.items():
        cells = [str(by_sf.get(sf, "-")) for sf in sorted(dirs)]
        print(f"| {name} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
