"""Training-data deduplication operators over a documents table.

All pure column expressions (JVM-side):
- exact dedup: hash-groupBy on text with a deterministic keeper
- MinHash signatures: k permutations of md5-derived shingle ints
  (md5 → first 15 hex chars → int60 is reproducible in ANY SQL engine,
  which is what lets DuckDB oracle-check the signatures exactly)
- MinHash-LSH banding: signature bands → bucket ids → candidate pairs
- n-gram Jaccard: shingle explode + self-join + |∩|/|∪|
- SimHash: sign-aggregated token-hash bits
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from helix_spark.functions.text import shingles_col

# (a, b) pairs for the universal-hash permutations
# h_i(x) = ((x % P) * a_i + b_i) % P with P = 2^31 − 1 and a_i, b_i < P:
# (x % P) * a < 2^62, so the arithmetic never overflows int64 in either
# Spark or DuckDB (DuckDB RAISES on bigint overflow instead of wrapping).
MINHASH_PRIME = 2147483647  # 2^31 − 1 (Mersenne)
MINHASH_PERMS: list[tuple[int, int]] = [
    (1299721, 104729), (15485863, 32452843), (49979687, 86028121),
    (67867967, 122949823), (141650939, 198491317), (217645177, 256203161),
    (295075147, 314606869), (370248451, 413158511),
]


def md5_int60_col(s):
    """First 60 bits of md5 as a signed-positive long — identical in Spark
    (conv) and DuckDB (('0x'||substr)::bigint)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one keeper (min id) per distinct text."""
    return docs.groupBy(md5_int60_col(F.col(text_col)).alias("text_fp")).agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies")
    )


def minhash_signature(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 4, shingle_n: int = 3,
) -> DataFrame:
    """k-permutation MinHash over word shingles. Documents with no shingles
    (shorter than n words) get NULL components."""
    sh = shingles_col(F.col(text_col), shingle_n)
    ints = F.transform(sh, lambda s: md5_int60_col(s))
    # two-step projection: the md5 shingle-int array is referenced k times,
    # and CollapseProject refuses to re-inline non-cheap expressions — so
    # this computes the md5s ONCE per row instead of once per permutation
    # (4x speedup at k=4; 41s → single-digit seconds on 5k docs)
    with_ints = docs.select(F.col(id_col), ints.alias("__ints"))

    def _perm(a, b):
        # closure factory: PySpark derives lambda arity from the signature,
        # so default-arg captures (lambda x, a=a) would read as multi-arg
        return lambda x: ((x % MINHASH_PRIME) * a + b) % MINHASH_PRIME

    cols = [F.col(id_col)]
    for i in range(k):
        a, b = MINHASH_PERMS[i]
        cols.append(F.array_min(F.transform(F.col("__ints"), _perm(a, b))).alias(f"mh{i}"))
    return with_ints.select(*cols)


def minhash_lsh_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 8, bands: int = 4, shingle_n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: split the k-component signature into bands, bucket-join.
    → candidate pairs (id_a < id_b) that share ≥1 band bucket. Scale path:
    the self-join is on (band, bucket) — hash-partitioned, no full cross.

    HOT-BUCKET GUARD (``max_bucket_size``): a degenerate bucket (a
    boilerplate/near-identical cluster) would make the self-join quadratic
    in that bucket. Buckets larger than the cap emit STAR pairs instead —
    every member paired with the bucket's min id. That keeps the output
    O(bucket) while preserving the connectivity a union-find dedup pass
    needs (all members still land in one component). None = exact all-pairs
    (the oracle-checked default)."""
    # localCheckpoint the (tiny: one row per doc) signature table: the band
    # explosion references it 4+ times and the bucket SELF-join squares the
    # tree — without truncation Catalyst re-inlines the md5/shingle
    # transform forest into every branch and plan compilation alone
    # explodes (observed: minutes at 5k docs with the bucket-cap variant).
    sig = minhash_signature(docs, text_col, id_col, k, shingle_n).localCheckpoint()
    rows_per_band = k // bands
    buckets = []
    for b in range(bands):
        comps = [F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)]
        # md5-int bucket (not xxhash64) so a plain-SQL oracle can reproduce it
        bucket = md5_int60_col(F.concat_ws("|", *[c.cast("string") for c in comps]))
        buckets.append(
            sig.select(F.col(id_col), F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    exploded = buckets[0]
    for bdf in buckets[1:]:
        exploded = exploded.unionByName(bdf)

    if max_bucket_size is not None:
        stats = exploded.groupBy("band", "bucket").agg(
            F.count("*").alias("__n"), F.min(id_col).alias("__rep")
        )
        tagged = exploded.join(stats, on=["band", "bucket"])
        small = tagged.filter(F.col("__n") <= max_bucket_size).drop("__n", "__rep")
        star = (
            tagged.filter((F.col("__n") > max_bucket_size) & (F.col(id_col) != F.col("__rep")))
            .select(F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b"))
        )
        left = small.withColumnRenamed(id_col, "id_a")
        right = small.withColumnRenamed(id_col, "id_b")
        all_pairs = (
            left.join(right, on=["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        return all_pairs.unionByName(star).distinct()

    left = exploded.withColumnRenamed(id_col, "id_a")
    right = exploded.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 3, threshold: float = 0.5,
    assert_max_docs: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via shingle explode + equi-self-join.
    Output pairs with jaccard_milli = floor(1000*|∩|/|∪|) ≥ threshold.

    WARNING — quadratic on repetitive corpora: the shingle self-join blows
    up with shared shingles (boilerplate), so CORPUS-WIDE calls do not
    survive scale. This operator exists as the oracle-able exact twin and
    as the verify stage of ``near_dup_pairs`` (which prunes to LSH
    candidates first) — use near_dup_pairs for corpus-wide dedup. Set
    ``assert_max_docs`` to fail fast if the input exceeds a sane bound for
    an exact all-pairs run (costs one count job)."""
    if assert_max_docs is not None:
        n = docs.count()
        if n > assert_max_docs:
            raise ValueError(
                f"ngram_jaccard_pairs: {n} docs > assert_max_docs="
                f"{assert_max_docs}. Corpus-wide exact Jaccard is quadratic "
                f"— use near_dup_pairs (LSH-pruned) instead."
            )
    # materialize the shingle explode once: it is referenced THREE times
    # (sizes + both join sides) and the md5/shingle transform forest would
    # otherwise run per reference (the same CollapseProject landmine the
    # near-dup pipeline already guards against)
    sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_col(F.col(text_col), shingle_n))).alias("sh"),
    ).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    common = (
        a.join(b, on="sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), on="id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), on="id_b")
        .withColumn(
            "jaccard_milli",
            F.floor(
                F.lit(1000) * F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).cast("long"),
        )
        .filter(F.col("jaccard_milli") >= int(threshold * 1000))
        .select("id_a", "id_b", "n_common", "jaccard_milli")
    )
    return out


def near_dup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 8, bands: int = 4, shingle_n: int = 3, threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """THE scale-correct near-dup pipeline: MinHash-LSH candidate generation
    → exact n-gram Jaccard verification on CANDIDATES ONLY. Corpus-wide
    exact Jaccard (ngram_jaccard_pairs) is quadratic on repetitive corpora;
    this bounds the exact stage to the LSH candidate set, which is the only
    shape that survives 100 TB. Deterministic (LSH buckets are md5-derived),
    so a SQL oracle reproduces it exactly."""
    cand = minhash_lsh_pairs(
        docs, text_col, id_col, k, bands, shingle_n, max_bucket_size
    ).localCheckpoint()  # small pair list; truncate before the shingle joins
    # exact verify touches ONLY candidate docs: prune the shingle explode to
    # ids that appear in a candidate pair (broadcast semi — candidates are
    # tiny relative to the corpus at scale) and materialize it once instead
    # of re-running the explode for each side of the pair join + the sizes
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = (
        docs.join(F.broadcast(cand_ids), on=id_col, how="left_semi")
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles_col(F.col(text_col), shingle_n))).alias("sh"),
        )
        .localCheckpoint()
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("id_a"), "sh")
    sb = sh.select(F.col(id_col).alias("id_b"), "sh")
    common = (
        cand.join(sa, on="id_a")
        .join(sb, on=["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), on="id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), on="id_b")
        .withColumn(
            "jaccard_milli",
            F.floor(
                F.lit(1000) * F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).cast("long"),
        )
        .filter(F.col("jaccard_milli") >= int(threshold * 1000))
        .select("id_a", "id_b", "n_common", "jaccard_milli")
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              bits: int = 16) -> DataFrame:
    """SimHash: per token, md5-derived bits vote ±1; bit i of the output is
    set iff more than half the tokens have bit i set (2·ones > n). Pure bit
    ops (shiftright / %) so a plain-SQL oracle reproduces it exactly.
    ``bits`` kept small so the oracle stays readable."""
    from helix_spark.functions.text import tokens_col

    toks = tokens_col(F.col(text_col))
    ints = F.transform(toks, lambda t: md5_int60_col(t))
    # two-step projection (same fix as minhash_signature above): the md5
    # token-int array is referenced 2×bits times and CollapseProject will
    # not re-inline a non-cheap expression — materialize it ONCE per row
    with_ints = docs.select(F.col(id_col), ints.alias("__ints"))
    arr = F.col("__ints")
    n = F.size(arr)

    def _one_bit(i):
        return lambda x: (F.shiftright(x, i) % 2) == 1

    val = F.lit(0).cast("long")
    for i in range(bits):
        ones = F.size(F.filter(arr, _one_bit(i)))
        val = val + F.when(ones * 2 > n, F.lit(2**i)).otherwise(F.lit(0)).cast("long")
    return with_ints.select(F.col(id_col), val.alias("simhash"))


def connected_components(
    pairs: DataFrame, nodes: DataFrame,
    id_a: str = "id_a", id_b: str = "id_b", node_col: str = "doc_id",
    max_iters: int = 30,
) -> DataFrame:
    """Connected components over an undirected pair graph — the union-find
    consumer of the near-dup pipelines: every document gets
    ``component_id`` = the smallest doc id reachable through near-duplicate
    pairs (documents in no pair are their own singleton component), which
    is exactly what a keep-one-per-cluster dedup pass keys on.

    Implementation: min-label propagation as iterative DataFrame joins —
    each round every node adopts the minimum label among itself and its
    neighbors; fixpoint when the label-sum stops changing (labels only
    ever decrease, so the sum is a strictly-decreasing convergence
    witness — no row-level comparison join needed). Each round is
    localCheckpointed (iterative-loop lineage landmine) and the previous
    round's blocks are freed.

    Scale posture: rounds = graph diameter. The near-dup generators cap
    hot buckets with STAR pairs (all members → min id), which keeps
    cluster diameters small by construction, so a handful of rounds
    suffice; for adversarial long-chain graphs the known scale path is
    alternating large-star/small-star (O(log n) rounds) — same join
    shapes, more bookkeeping. Never materializes anything O(n²): each
    round is |E|+|V| join/aggregate work.
    """
    from helix_spark.operators.rank import free_local_checkpoint

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), F.col("component"))
        )
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        new_sum = new.agg(F.sum("component")).collect()[0][0]
        free_local_checkpoint(labels)
        labels = new
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    free_local_checkpoint(edges)
    return labels.select(F.col("node").alias(node_col), "component")


def simhash_near_dup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bits: int = 16, bands: int = 4, max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs — the Hamming-space member of the dedup
    family (exact / MinHash-Jaccard / embedding-cosine / SimHash-Hamming).

    Band-bucket candidate generation + exact Hamming verify:
    the ``bits``-bit simhash splits into ``bands`` equal slices; documents
    sharing ANY slice value become candidates (self-join on (band, slice) —
    hash-partitioned, never all-pairs); candidates keep the pair iff
    bit_count(xor(sim_a, sim_b)) ≤ ``max_hamming``.

    EXACTNESS (pigeonhole): with ``bands > max_hamming``, any pair within
    the Hamming radius differs in ≤ max_hamming bits, which cannot touch
    all ``bands`` slices — so at least one slice matches and the pair IS a
    candidate. The default (4 bands, radius 3) therefore returns EXACTLY
    the pairs with hamming ≤ 3 — complete, not approximate — and a plain
    SQL oracle reproduces it bit-for-bit (integer simhash, xor, bit_count
    identical across engines)."""
    if bits % bands != 0:
        raise ValueError(f"bits={bits} must divide into bands={bands}")
    width = bits // bands
    mask = (1 << width) - 1
    sig = simhash64(docs, text_col, id_col, bits).localCheckpoint()
    slices = []
    for b in range(bands):
        slices.append(
            sig.select(
                F.col(id_col), F.col("simhash"),
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("slice"),
            )
        )
    exploded = slices[0]
    for s in slices[1:]:
        exploded = exploded.unionByName(s)
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__sa"), "band", "slice"
    )
    b_ = exploded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__sb"), "band", "slice"
    )
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (
        a.join(b_, on=["band", "slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
