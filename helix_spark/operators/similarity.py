"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: F.aggregate/zip_with dot products, JVM-side —
  the exactness baseline
- LSH-bucketed ANN: deterministic hyperplane sign-bits bucket the corpus;
  probing only scans matching buckets — the scale path (buckets are
  hash-partitionable; at 10^9 vectors the probe is a bucket-pruned join,
  not a scan)
- IVF ANN: data-adaptive coarse quantizer (mini-Lloyd's) with the same
  pruned-probe shape
- embedding-cosine near-dup pairs: the vector twin of MinHash-LSH dedup —
  sign-bit buckets → bounded same-bucket self-join → exact integer verify

Cross-engine exactness: every bucketing/assignment decision is made in
INTEGER arithmetic over floor(x·quant) quantized vectors, so a plain-SQL
oracle (DuckDB) reproduces buckets, probes, assignments, and verify
decisions bit-for-bit — no float-boundary flakiness between engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from helix_spark.functions.colcache import cached_col
from helix_spark.functions.vectors import cosine_col


def _lit_array(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def _lit_long_array(vec: list[int]):
    return F.array(*[F.lit(int(x)).cast("long") for x in vec])


def _long_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )


def quantize_vec_col(vec_col, quant: int):
    """floor(x·quant) per element as long — the shared Spark/SQL quantizer."""
    return F.transform(vec_col, lambda x: F.floor(x.cast("double") * quant).cast("long"))


def quantize_vec_py(vec: list[float], quant: int) -> list[int]:
    return [math.floor(float(x) * quant) for x in vec]


def brute_force_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tiebreak on id.
    Elements are cast to double BEFORE any arithmetic so results are
    bit-reproducible against a double-precision SQL oracle."""
    cos = cached_col(
        ("brute_cos", vec_col, tuple(float(x) for x in query_vec)),
        lambda: cosine_col(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            _lit_array(query_vec),
        ),
    )
    scored = embeddings.select(F.col(id_col), cos.alias("cos"))
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


def quantized_planes(dim: int, n_planes: int, quant: int = 100,
                     seed: int = 42) -> list[list[int]]:
    """Integer-quantized hyperplanes — the form every bucketing decision
    actually uses (Spark and SQL oracle alike)."""
    return [
        [int(math.floor(p * quant)) for p in row]
        for row in deterministic_planes(dim, n_planes, seed)
    ]


def sign_bucket_py(qvec: list[int], qplanes: list[list[int]]) -> int:
    """Driver-side twin of the integer sign-bit bucketing."""
    b = 0
    for i, row in enumerate(qplanes):
        if sum(a * c for a, c in zip(qvec, row)) >= 0:
            b |= 1 << i
    return b


def auto_n_planes(n_rows: int, target_bucket: int = 256,
                  lo: int = 4, hi: int = 24) -> int:
    """Default plane count scaled with corpus size: 2^n_planes buckets with
    ~``target_bucket`` vectors each. A FIXED plane count cannot survive
    growth — 16 buckets over 10^9 vectors puts ~6·10^7 vectors per bucket
    and the same-bucket self-join goes quadratic; buckets must grow with n."""
    if n_rows <= 0:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(max(n_rows / target_bucket, 2.0)))))


# int64-safety bound for the exact-integer verify: the verify compares
# dot²·10⁴ against t²·na·nb with t ≤ 100; by Cauchy-Schwarz dot² ≤ na·nb,
# so both sides are ≤ max(n2)²·10⁴ — demanding max(n2) ≤ this bound keeps
# every intermediate below 2^63 (no silent wrap in Spark; DuckDB would
# promote to HUGEINT and silently diverge).
_MAX_SAFE_NORM2 = math.floor(math.sqrt((2**63 - 1) / 10_000))


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold_e2: int = 90, n_planes: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding", quant: int = 100,
    max_bucket_size: int | None = None,
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

    which is cos ≥ threshold_e2/100 in exact integer arithmetic. The
    int64-safety precondition (max |a|² ≤ ~9.6·10⁸) is CHECKED at runtime
    from a max-norm² metric riding the quantize pass — violation raises
    instead of silently wrapping. The reported cos_e4 recomputes
    floor(10⁴·dot/√(|a|²·|b|²)) — identical IEEE doubles from identical
    int inputs on both engines.

    Scale guards (mirroring minhash_lsh_pairs, textdedup.py):
    - ``n_planes=None`` → scaled with corpus size (auto_n_planes): bucket
      count grows with n so the expected bucket stays ~constant.
    - ``max_bucket_size``: a degenerate bucket (boilerplate/duplicate
      cluster) would make the self-join quadratic in that bucket. Over-cap
      buckets emit STAR candidates instead — every member paired with the
      bucket's min id — keeping the output O(bucket) while preserving the
      connectivity a union-find dedup pass needs. Star candidates still go
      through the exact cosine verify. None = exact all-pairs per bucket."""
    if n_planes is None:
        n_planes = auto_n_planes(embeddings.count())
    qplanes = quantized_planes(_dim_of(embeddings, vec_col), n_planes, quant)
    q = quantize_vec_col(F.col(vec_col), quant)

    def _build_bucket():
        bucket = None
        for i, row in enumerate(qplanes):
            d = _long_dot(F.col("__q"), _lit_long_array(row))
            term = F.when(d >= 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
            bucket = term if bucket is None else bucket + term
        return bucket

    # pure trees over the fixed __q name — cached per plane set (the
    # dominant build cost of this operator, ~0.5 s of py4j at dim 64)
    bucket = cached_col(
        ("sign_bucket_q", tuple(tuple(r) for r in qplanes)), _build_bucket
    )
    norm2 = cached_col(
        ("norm2_q",),
        lambda: F.aggregate(
            F.transform(F.col("__q"), lambda x: x * x),
            F.lit(0).cast("long"), lambda acc, v: acc + v,
        ),
    )
    obs = Observation()
    base = embeddings.select(
        F.col(id_col), q.alias("__q")
    ).select(
        F.col(id_col), F.col("__q"), bucket.alias("__bucket"), norm2.alias("__n2")
    ).observe(
        obs, F.max("__n2").alias("max_n2")
    ).localCheckpoint()  # tiny (one row/vector); truncates the quantize tree
    from helix_spark.operators.rank import observed_metrics

    max_n2 = observed_metrics(obs).get("max_n2") or 0
    if max_n2 > _MAX_SAFE_NORM2:
        raise ValueError(
            f"embedding_near_dup_pairs: quantized norm² {max_n2} exceeds the "
            f"int64-safe bound {_MAX_SAFE_NORM2} — the exact-integer verify "
            f"would overflow (Spark wraps, DuckDB promotes: silent cross-"
            f"engine divergence). Lower `quant` (now {quant}) or normalize "
            f"the embeddings."
        )
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("__q").alias("__qa"),
        F.col("__bucket"), F.col("__n2").alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("__q").alias("__qb"),
        F.col("__bucket"), F.col("__n2").alias("nb"),
    )
    if max_bucket_size is not None:
        # hot-bucket cap (same star rule as minhash_lsh_pairs): per-bucket
        # stats are ≤2^n_planes rows → broadcast; over-cap buckets join
        # members to the single representative row instead of self-joining
        stats = base.groupBy("__bucket").agg(
            F.count("*").alias("__n"), F.min(id_col).alias("__rep")
        )
        a_s = a.join(F.broadcast(stats), on="__bucket")
        b_s = b.join(F.broadcast(stats.select("__bucket", "__n")), on="__bucket")
        small_pairs = (
            a_s.filter(F.col("__n") <= max_bucket_size).drop("__n", "__rep")
            .join(b_s.filter(F.col("__n") <= max_bucket_size).drop("__n"), on="__bucket")
            .filter(F.col("id_a") < F.col("id_b"))
        )
        reps = a_s.filter(
            (F.col("__n") > max_bucket_size) & (F.col("id_a") == F.col("__rep"))
        ).drop("__n", "__rep")
        star_pairs = (
            reps.join(
                b_s.filter(F.col("__n") > max_bucket_size).drop("__n"), on="__bucket"
            ).filter(F.col("id_a") < F.col("id_b"))
        )
        pairs = small_pairs.unionByName(star_pairs)
    else:
        pairs = a.join(b, on="__bucket").filter(F.col("id_a") < F.col("id_b"))
    dot = _long_dot(F.col("__qa"), F.col("__qb"))
    pairs = pairs.withColumn("dot", dot).filter(
        (F.col("dot") > 0)
        & (F.col("dot") * F.col("dot") * 10_000
           >= F.lit(threshold_e2 * threshold_e2) * F.col("na") * F.col("nb"))
    )
    cos_e4 = F.floor(
        F.lit(10000.0) * F.col("dot")
        / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
    ).cast("long")
    return pairs.select("id_a", "id_b", cos_e4.alias("cos_e4")).distinct()


# Scoring quantization for the integer-exact ANN rank (distinct from the
# coarse BUCKETING quant=100): fine enough (~1e-6 cosine resolution) that
# ranking is indistinguishable from double-cosine ordering on real data,
# while every comparison stays exact integer arithmetic.
ANN_SCORE_QUANT = 1_000_000
# key = dot²·10⁴ div n2 and by Cauchy-Schwarz dot² ≤ n2·qn2, so the key is
# ≤ qn2·10⁴: norms up to this bound keep the key (and dot itself) in int64.
# quant=10⁶, |x|≤1, dim=64 → n2 ≤ 6.4·10¹³ — 14× margin.
_MAX_SAFE_ANN_NORM2 = (2**63 - 1) // 10_000


def quantized_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    quant: int = ANN_SCORE_QUANT,
) -> DataFrame:
    """Top-k by INTEGER-EXACT quantized-cosine ranking — the cross-engine-
    deterministic scorer behind the ANN paths. Ranks by

        key = sign(dot) · (dot² · 10⁴ div n2)      n2 = |v_q|², all exact:
                                                   dot/n2 int64, dot² in
                                                   decimal(38)/HUGEINT

    over floor(x·quant) vectors: monotone in cos(v_q, q_q) (the common
    query norm cancels), and — unlike a raw double cosine — the SAME
    integer in Spark and any SQL engine, so ranks can never flip at a
    float boundary between engines (round-3 ADVICE: the previous double-
    cosine rank's whole-result exactness rested on bitwise-equal doubles).
    At quant=10⁶ the induced cosine resolution is ~1e-6 — ordering is
    double-grade; ties in key break on id, identically everywhere. cos_e4
    derives from the same integers via one fixed double expression
    (10000.0·dot / sqrt(double(n2)·double(qn2))) — identical IEEE result
    from identical int inputs on both engines.

    Int64/decimal safety: requires n2, qn2 ≤ (2^63−1)/10⁴ ≈ 9.2·10¹⁴
    (_MAX_SAFE_ANN_NORM2) — then |dot| ≤ √(n2·qn2) fits int64 and the key
    ≤ qn2·10⁴ fits int64 (dot² itself runs in decimal(38,0), matching the
    oracle's HUGEINT). The query side is checked on the driver; the corpus
    side by a per-row executor-side raise_error guard (no extra
    materialization — the guard rides the scoring projection)."""
    qq = quantize_vec_py(query_vec, quant)
    qn2 = sum(x * x for x in qq)
    if qn2 > _MAX_SAFE_ANN_NORM2:
        raise ValueError(
            f"quantized_topk: query norm² {qn2} exceeds the int64-safe "
            f"bound {_MAX_SAFE_ANN_NORM2} — lower `quant` (now {quant})"
        )

    def _build_score_cols():
        vq = quantize_vec_col(F.col(vec_col), quant)
        n2 = F.aggregate(
            F.transform(F.col("__vq"), lambda x: x * x),
            F.lit(0).cast("long"), lambda a, x: a + x,
        )
        dot = _long_dot(F.col("__vq"), _lit_long_array(qq))
        guarded_n2 = F.when(
            F.col("__n2") > _MAX_SAFE_ANN_NORM2,
            F.raise_error(F.lit(
                "quantized_topk: corpus vector norm² exceeds the int64-safe "
                "bound — lower `quant` or normalize the embeddings"
            )).cast("long"),
        ).otherwise(F.col("__n2"))
        # decimal(38,0) square + `div` (integral division, returns long —
        # verified to match DuckDB's HUGEINT // bit-for-bit); a double
        # divide would round above 2^53 and break cross-engine identity
        mag = F.expr(
            "cast(__dot as decimal(38,0)) * __dot * 10000 div greatest(__n2, 1)"
        )
        key = (
            F.when(F.col("__n2") == 0, F.lit(0).cast("long"))
            .when(F.col("__dot") >= 0, mag)
            .otherwise(-mag)
        )
        cos_e4 = F.when(F.col("__n2") == 0, F.lit(0)).otherwise(
            F.floor(
                F.lit(10000.0) * F.col("__dot")
                / F.sqrt(F.col("__n2").cast("double") * F.lit(float(qn2)))
            )
        ).cast("long")
        return vq, n2, dot, guarded_n2, key, cos_e4

    # pure trees over the fixed __vq/__n2/__dot names + (qq, quant)
    # literals — the dim-element query array and the lambda forests are the
    # build cost; cached per (vec_col, quant, query vector)
    vq, n2, dot, guarded_n2, key, cos_e4 = cached_col(
        ("qtopk_score", vec_col, quant, tuple(qq)), _build_score_cols
    )
    scored = (
        embeddings.select(F.col(id_col), vq.alias("__vq"))
        .select(F.col(id_col), dot.alias("__dot"), n2.alias("__n2"))
    )
    scored = scored.withColumn("__n2", guarded_n2)
    w = Window.orderBy(F.col("__key").desc(), F.col(id_col))
    return (
        scored.withColumn("__key", key)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", cos_e4.alias("cos_e4"))
    )


def deterministic_centroids(dim: int, k: int, seed: int = 99) -> list[list[float]]:
    """Fixed LCG-derived coarse centroids — the oracle-able IVF
    configuration: with literal centroids, assignment/probe/scoring are
    plain-SQL-expressible (entry_queries). Trained centroids
    (ivf_train_centroids) are the data-adaptive alternative; recall of both
    is asserted in tests/test_similarity.py."""
    return deterministic_planes(dim, k, seed)


def ivf_train_centroids(
    embeddings: DataFrame, n_centroids: int = 8, n_iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
) -> list[list[float]]:
    """Deterministic mini-Lloyd's for an IVF coarse quantizer: seed
    centroids are the ``n_centroids`` corpus vectors with the smallest
    ``xxhash64(id)`` (a distributed TakeOrderedAndProject — a partial
    per-partition top-k then a driver merge of k rows; an earlier version
    ranked the WHOLE corpus through one partitionless window sort to index
    LCG picks, a single-task O(n log n) that dies before training at 10^9
    vectors). Then ``n_iters`` assignment/mean rounds as DataFrame
    aggregations; only the k×dim centroid matrix ever reaches the driver."""
    k = int(n_centroids)
    if k <= 0:
        raise ValueError(f"n_centroids must be positive, got {n_centroids}")
    # deterministic pseudo-random seed pick, no global sort: k smallest
    # (xxhash64(id), id) — the id tiebreak makes it total even under hash
    # collisions. orderBy+limit plans as TakeOrderedAndProject.
    rows = (
        embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64(F.col("__id").cast("string")), F.col("__id"))
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("ivf_train_centroids: empty corpus")
    centroids = [[float(x) for x in r["__v"]] for r in rows]
    # corpus smaller than k: train with what exists (clamped k)
    k = len(centroids)

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
    """argmin ||v - c||² as a column expr: array_min over (dist, idx)
    structs — pure JVM, ties break to the lowest index."""
    structs = []
    for ci, c in enumerate(centroids):
        carr = _lit_array(c)
        d = F.aggregate(
            F.zip_with(v, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        structs.append(F.struct(d.alias("d"), F.lit(ci).alias("i")))
    return F.array_min(F.array(*structs)).getField("i")


def _nearest_centroid_quant_col(vq, qcentroids: list[list[int]]):
    """Integer argmin ||v_q − c_q||²: dist = |v|² − 2·v·c + |c|², all int64
    (exact — the form a SQL oracle reproduces). Ties → lowest index."""
    n2 = F.aggregate(
        F.transform(vq, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    structs = []
    for ci, c in enumerate(qcentroids):
        carr = _lit_long_array(c)
        c2 = sum(x * x for x in c)
        d = n2 - 2 * _long_dot(vq, carr) + F.lit(int(c2)).cast("long")
        structs.append(F.struct(d.alias("d"), F.lit(ci).alias("i")))
    return F.array_min(F.array(*structs)).getField("i")


def ivf_probe_order_py(query_vec: list[float], qcentroids: list[list[int]],
                       quant: int = 100) -> list[int]:
    """Centroid indices by ascending integer distance to the quantized
    query (ties → lowest index) — the driver-side twin of the integer
    assignment, shared by the Spark query and the SQL-oracle builder."""
    qq = quantize_vec_py(query_vec, quant)
    n2 = sum(x * x for x in qq)
    dists = []
    for i, c in enumerate(qcentroids):
        d = n2 - 2 * sum(a * b for a, b in zip(qq, c)) + sum(x * x for x in c)
        dists.append((d, i))
    return [i for _, i in sorted(dists)]


def ivf_ann_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    centroids: list[list[float]] | None = None, n_centroids: int = 8,
    nprobe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
    quant: int | None = None,
) -> DataFrame:
    """IVF approximate top-k (the centroid-bucketed alternative to
    hyperplane LSH): assign the corpus to its nearest coarse centroid, scan
    only the ``nprobe`` centroids closest to the query. At scale the corpus
    is written partitioned by centroid id, so the probe reads nprobe
    partitions — same pruned-scan shape as the LSH variant, but
    data-adaptive. Recall vs brute force is asserted in tests.

    ``quant`` set → assignment and probe selection run in EXACT INTEGER
    arithmetic over floor(x·quant) vectors/centroids, making the whole
    query SQL-oracle-reproducible (entry_queries `ivf_ann_topk`); None
    keeps double-precision assignment (fine Spark-side, not cross-engine
    exact at float boundaries)."""
    if centroids is None:
        centroids = ivf_train_centroids(embeddings, n_centroids, id_col=id_col, vec_col=vec_col)
    if quant is not None:
        qcents = [quantize_vec_py(c, quant) for c in centroids]
        vq = quantize_vec_col(F.col(vec_col), quant)
        assigned = embeddings.withColumn("__c", _nearest_centroid_quant_col(vq, qcents))
        probe = ivf_probe_order_py(query_vec, qcents, quant)[:nprobe]
    else:
        dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        assigned = embeddings.withColumn("__c", _nearest_centroid_col(dvec, centroids))
        qd = sorted(
            (sum((a - b) ** 2 for a, b in zip(query_vec, c)), i)
            for i, c in enumerate(centroids)
        )
        probe = [i for _, i in qd[:nprobe]]
    cand = assigned.filter(F.col("__c").isin(*probe)).drop("__c")
    if quant is not None:
        # integer-exact end-to-end: assignment/probe at `quant`, ranking at
        # the fine ANN_SCORE_QUANT (quantized_topk)
        return quantized_topk(cand, query_vec, k, id_col, vec_col)
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def _dim_of(embeddings: DataFrame, vec_col: str) -> int:
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])


def lsh_probe_buckets_py(query_vec: list[float], qplanes: list[list[int]],
                         multiprobe: int = 1, quant: int = 100) -> list[int]:
    """The probe-bucket set for a query: its own integer sign-bit bucket
    plus all ≤``multiprobe``-flip neighbors. Driver-side, shared by the
    Spark query and the SQL-oracle builder."""
    n_planes = len(qplanes)
    qbits = sign_bucket_py(quantize_vec_py(query_vec, quant), qplanes)
    probes = {qbits}
    if multiprobe >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    if multiprobe >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes) for j in range(i + 1, n_planes)
        }
    return sorted(probes)


def lsh_ann_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, n_planes: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding", multiprobe: int = 1,
    quant: int = 100,
) -> DataFrame:
    """Approximate top-k: scan only the query's hyperplane-sign bucket plus
    its ``multiprobe`` nearest neighbor buckets (Hamming distance ≤
    multiprobe flips of the sign bits — the standard multiprobe-LSH recall
    repair: near neighbors that fall on the far side of ONE hyperplane are
    recovered without growing the corpus-side bucket count). multiprobe=0
    is the single-bucket probe. Recall < 1 by design; within the probed
    buckets, ranking is by the integer-quantized cosine (quantized_topk).
    Recall@k vs brute force is measured in tests/test_similarity.py across
    n_planes and multiprobe settings.

    Bucketing runs in EXACT INTEGER arithmetic over floor(x·quant) vectors
    and planes, so bucket membership (and therefore the whole result) is
    SQL-oracle-reproducible — no float sign flips at plane boundaries
    between engines.

    Scale shape: the corpus side is bucket-pruned by an IN filter over
    1 + n_planes·multiprobe literals — a scan filter, no shuffle, and with
    the corpus written bucket-partitioned the probe reads only those
    partitions."""
    qplanes = quantized_planes(len(query_vec), n_planes, quant)

    def _build_bucket():
        vq = quantize_vec_col(F.col(vec_col), quant)
        bucket = None
        for i, row in enumerate(qplanes):
            d = _long_dot(vq, _lit_long_array(row))
            term = F.when(d >= 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
            bucket = term if bucket is None else bucket + term
        return bucket

    # the bucket forest is n_planes × (dim-literal array + lambda dot) of
    # pure py4j tree building (~0.5 s at dim 64 — more than the query's
    # whole execution); cache it per (vec_col, quant, planes)
    bucket = cached_col(
        ("lsh_bucket", vec_col, quant, tuple(tuple(r) for r in qplanes)),
        _build_bucket,
    )
    bucketed = embeddings.withColumn("bucket", bucket)
    probes = lsh_probe_buckets_py(query_vec, qplanes, multiprobe, quant)
    cand = bucketed.filter(F.col("bucket").isin(*probes))
    # integer-exact end-to-end: bucketing at `quant`, ranking at the fine
    # ANN_SCORE_QUANT — the whole result, ranks included, is reproducible
    # in any SQL engine without float-boundary assumptions
    return quantized_topk(cand, query_vec, k, id_col, vec_col)
