"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: F.aggregate/zip_with dot products, JVM-side —
  the exactness baseline
- LSH-bucketed ANN: deterministic hyperplane sign-bits (functions/vectors
  .sign_bits_col) bucket the corpus; probing only scans matching buckets —
  the scale path (buckets are hash-partitionable; at 10^9 vectors the probe
  is a bucket-pruned join, not a scan)
"""

from __future__ import annotations

import math

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


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold_e2: int = 90, n_planes: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding", quant: int = 100,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector twin of
    MinHash-LSH dedup, and the same scale shape: hyperplane sign-bit
    buckets → same-bucket self-join (never all-pairs) → exact verify on
    candidates only.

    EXACT-INTEGER verify so a SQL oracle reproduces it bit-for-bit:
    embeddings and planes are quantized to ``quant`` units
    (floor(x·quant) int64); bucketing uses the sign of the INTEGER dot
    product; a pair qualifies iff

        dot > 0  ∧  dot²·10⁴ ≥ threshold_e2²·|a|²·|b|²

    which is cos ≥ threshold_e2/100 in exact integer arithmetic (no float
    boundary flakiness; int64-safe: dim·(quant·|x|max)² ≪ 2³¹). The
    reported cos_e4 recomputes floor(10⁴·dot/√(|a|²·|b|²)) — identical
    IEEE doubles from identical int inputs on both engines."""
    planes = deterministic_planes(
        _dim_of(embeddings, vec_col), n_planes
    )
    qplanes = [[int(math.floor(p * quant)) for p in row] for row in planes]
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * quant).cast("long")
    )
    bucket = None
    for i, row in enumerate(qplanes):
        plane = F.array(*[F.lit(v).cast("long") for v in row])
        d = F.aggregate(
            F.zip_with(F.col("__q"), plane, lambda a, b: a * b),
            F.lit(0).cast("long"), lambda acc, v: acc + v,
        )
        term = F.when(d >= 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
        bucket = term if bucket is None else bucket + term
    norm2 = F.aggregate(
        F.transform(F.col("__q"), lambda x: x * x),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    base = embeddings.select(
        F.col(id_col), q.alias("__q")
    ).select(
        F.col(id_col), F.col("__q"), bucket.alias("__bucket"), norm2.alias("__n2")
    ).localCheckpoint()  # tiny (one row/vector); truncates the quantize tree
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("__q").alias("__qa"),
        F.col("__bucket"), F.col("__n2").alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("__q").alias("__qb"),
        F.col("__bucket"), F.col("__n2").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("__qa"), F.col("__qb"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    pairs = (
        a.join(b, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (F.col("dot") * F.col("dot") * 10_000
               >= F.lit(threshold_e2 * threshold_e2) * F.col("na") * F.col("nb"))
        )
    )
    cos_e4 = F.floor(
        F.lit(10000.0) * F.col("dot")
        / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
    ).cast("long")
    return pairs.select("id_a", "id_b", cos_e4.alias("cos_e4")).distinct()


def ivf_train_centroids(
    embeddings: DataFrame, n_centroids: int = 8, n_iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
) -> list[list[float]]:
    """Deterministic mini-Lloyd's for an IVF coarse quantizer: seed
    centroids are LCG-picked corpus vectors (no RNG state), then
    ``n_iters`` assignment/mean rounds as DataFrame aggregations. Only the
    k×dim centroid matrix ever reaches the driver — assignment and means
    are distributed (posexplode over centroid literals → min_by → groupBy
    avg on F.aggregate sums)."""
    n = embeddings.count()
    state, picks = seed, set()
    while len(picks) < n_centroids:
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
        picks.add(state % n)
    # rank corpus rows deterministically by id to index the picks
    w = Window.orderBy(id_col)
    ranked = embeddings.withColumn("__r", F.row_number().over(w) - 1)
    rows = ranked.filter(F.col("__r").isin(*[int(p) for p in picks])).orderBy("__r").collect()
    centroids = [[float(x) for x in r[vec_col]] for r in rows]

    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = embeddings.select(F.col(id_col), dvec.alias("__v")).localCheckpoint()
    dim = len(centroids[0])
    for _ in range(n_iters):
        assigned = base.withColumn("__c", _nearest_centroid_col(F.col("__v"), centroids))
        sums = assigned.groupBy("__c").agg(
            F.count("*").alias("__n"),
            *[
                F.sum(F.element_at(F.col("__v"), i + 1)).alias(f"__s{i}")
                for i in range(dim)
            ],
        ).collect()
        for r in sums:
            centroids[r["__c"]] = [r[f"__s{i}"] / r["__n"] for i in range(dim)]
    return centroids


def _nearest_centroid_col(v, centroids: list[list[float]]):
    """argmin ||v - c||² as a column expr: min_by over a posexploded-free
    array of (dist, idx) structs — pure JVM."""
    structs = []
    for ci, c in enumerate(centroids):
        carr = _lit_array(c)
        d = F.aggregate(
            F.zip_with(v, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        structs.append(F.struct(d.alias("d"), F.lit(ci).alias("i")))
    return F.array_min(F.array(*structs)).getField("i")


def ivf_ann_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    centroids: list[list[float]] | None = None, n_centroids: int = 8,
    nprobe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k (the centroid-bucketed alternative to
    hyperplane LSH): assign the corpus to its nearest coarse centroid, scan
    only the ``nprobe`` centroids closest to the query. At scale the corpus
    is written partitioned by centroid id, so the probe reads nprobe
    partitions — same pruned-scan shape as the LSH variant, but
    data-adaptive. Recall vs brute force is asserted in tests."""
    if centroids is None:
        centroids = ivf_train_centroids(embeddings, n_centroids, id_col=id_col, vec_col=vec_col)
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    assigned = embeddings.withColumn("__c", _nearest_centroid_col(dvec, centroids))
    qd = sorted(
        (sum((a - b) ** 2 for a, b in zip(query_vec, c)), i)
        for i, c in enumerate(centroids)
    )
    probe = [i for _, i in qd[:nprobe]]
    cand = assigned.filter(F.col("__c").isin(*probe)).drop("__c")
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def _dim_of(embeddings: DataFrame, vec_col: str) -> int:
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])


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
