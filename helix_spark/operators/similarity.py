"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: F.aggregate/zip_with dot products, JVM-side —
  the exactness baseline
- LSH-bucketed ANN: deterministic hyperplane sign-bits (functions/vectors
  .sign_bits_col) bucket the corpus; probing only scans matching buckets —
  the scale path (buckets are hash-partitionable; at 10^9 vectors the probe
  is a bucket-pruned join, not a scan)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from helix_spark.functions.vectors import cosine_col, sign_bits_col


def _lit_array(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tiebreak on id.
    Elements are cast to double BEFORE any arithmetic so results are
    bit-reproducible against a double-precision SQL oracle."""
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = embeddings.select(
        F.col(id_col),
        cosine_col(dvec, _lit_array(query_vec)).alias("cos"),
    )
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", F.floor(F.col("cos") * 10000).cast("long").alias("cos_e4"))
    )


def deterministic_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes derived from an LCG — no RNG state,
    same planes on every run/engine."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
            # top 32 bits → [0, 2^32) → [-1, 1). (A previous version took 31
            # bits over 2^31 which lands in [-1, 0): all-negative planes
            # collapse every vector into one bucket — no hashing at all.)
            row.append((state >> 32) / 2**31 - 1.0)
        planes.append(row)
    return planes


def lsh_ann_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, n_planes: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding", multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only the query's hyperplane-sign bucket plus
    its ``multiprobe`` nearest neighbor buckets (Hamming distance ≤
    multiprobe flips of the sign bits — the standard multiprobe-LSH recall
    repair: near neighbors that fall on the far side of ONE hyperplane are
    recovered without growing the corpus-side bucket count). multiprobe=0
    is the single-bucket probe. Recall < 1 by design; returned ranks are
    exact within the probed buckets. Recall@k vs brute force is measured in
    tests/test_similarity.py across n_planes and multiprobe settings.

    Scale shape: the corpus side is bucket-pruned by an IN filter over
    1 + n_planes·multiprobe literals — a scan filter, no shuffle, and with
    the corpus written bucket-partitioned the probe reads only those
    partitions."""
    dim = len(query_vec)
    planes = deterministic_planes(dim, n_planes)
    bucketed = embeddings.withColumn("bucket", sign_bits_col(F.col(vec_col), planes))
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qbits |= 1 << i
    probes = {qbits}
    if multiprobe >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    if multiprobe >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes) for j in range(i + 1, n_planes)
        }
    cand = bucketed.filter(F.col("bucket").isin(*sorted(probes)))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)
