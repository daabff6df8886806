"""Direct unit coverage for the text-dedup operators (round 1 exercised
them only through the driver battery): exact dedup, MinHash/LSH, the
hot-bucket guard, near-dup pipeline, SimHash."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from helix_spark.operators.textdedup import (
    MINHASH_PERMS,
    MINHASH_PRIME,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    near_dup_pairs,
    ngram_jaccard_pairs,
    simhash64,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),   # near dup of 1
    (4, "pack my box with five dozen liquor jugs today"),
    (5, "completely different content about spark engines"),
    (6, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").localCheckpoint()


def _md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_exact_dedup_keeper_and_counts(docs):
    rows = {r["text_fp"]: r for r in exact_dedup(docs).collect()}
    fp = _md5_int60(DOCS[0][1])
    assert rows[fp]["keeper_id"] == 1 and rows[fp]["n_copies"] == 3
    assert len(rows) == 4  # four distinct texts


def test_minhash_signature_matches_python(docs):
    """Component-wise against a pure-Python recomputation (3-shingles)."""
    sig = {r["doc_id"]: r for r in minhash_signature(docs, k=4).collect()}
    for doc_id, text in DOCS:
        toks = [t for t in text.lower().split(" ") if t]
        shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        ints = [_md5_int60(s) for s in shingles]
        for i in range(4):
            a, b = MINHASH_PERMS[i]
            expect = min(((x % MINHASH_PRIME) * a + b) % MINHASH_PRIME for x in ints)
            assert sig[doc_id][f"mh{i}"] == expect


def test_lsh_pairs_catch_exact_and_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, k=8, bands=4).collect()}
    assert (1, 2) in pairs and (1, 6) in pairs and (2, 6) in pairs  # identical texts
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup shares band buckets
    assert not any(5 in p for p in pairs)  # unrelated doc never pairs


def test_lsh_hot_bucket_guard_bounds_pairs(spark):
    """A degenerate corpus (every doc identical) puts all n docs in one
    bucket per band: uncapped → n(n−1)/2 pairs; capped → star pairs, O(n),
    while keeping every doc connected to the representative."""
    n = 60
    clones = spark.createDataFrame(
        [(i, "same boilerplate text repeated everywhere again") for i in range(1, n + 1)],
        "doc_id long, text string",
    )
    uncapped = minhash_lsh_pairs(clones, k=8, bands=4).count()
    assert uncapped == n * (n - 1) // 2
    capped = minhash_lsh_pairs(clones, k=8, bands=4, max_bucket_size=10).collect()
    assert len(capped) == n - 1  # star: rep(=1) paired with all others
    assert {r["id_a"] for r in capped} == {1}
    assert {r["id_b"] for r in capped} == set(range(2, n + 1))


def test_near_dup_pipeline_equals_exact_on_candidates(docs):
    """near_dup_pairs (LSH→exact verify) must agree with corpus-wide exact
    Jaccard on every pair LSH surfaces, and at this threshold the LSH pass
    surfaces all qualifying pairs."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard_milli"]
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    piped = {
        (r["id_a"], r["id_b"]): r["jaccard_milli"]
        for r in near_dup_pairs(docs, threshold=0.2).collect()
    }
    assert piped == exact


def test_simhash_identical_docs_equal_and_matches_python(docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash64(docs, bits=16).collect()}
    assert out[1] == out[2] == out[6]

    def py_simhash(text, bits=16):
        toks = [t for t in text.lower().split(" ") if t]
        ints = [_md5_int60(t) for t in toks]
        val = 0
        for i in range(bits):
            ones = sum(1 for x in ints if (x >> i) & 1)
            if 2 * ones > len(ints):
                val += 1 << i
        return val

    for doc_id, text in DOCS:
        assert out[doc_id] == py_simhash(text)


def test_simhash_near_dups_close_hamming(docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash64(docs, bits=16).collect()}
    ham_near = bin(out[1] ^ out[3]).count("1")
    ham_far = bin(out[1] ^ out[5]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_max_docs_guard(spark):
    """Corpus-wide exact Jaccard fails fast past the caller's bound."""
    import pytest as _pytest

    from helix_spark.operators.textdedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "one two three four five") for i in range(20)], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="near_dup_pairs"):
        ngram_jaccard_pairs(docs, assert_max_docs=10)
    # under the bound: runs
    assert ngram_jaccard_pairs(docs, assert_max_docs=100).count() > 0


def test_connected_components_basic(spark):
    """Chains, merged stars, singletons: component = min reachable id."""
    from helix_spark.operators.textdedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (via consecutive pairs), star 10-(11,12), bridge 12-3,
        # isolated pair 20-21; node 30 in no pair
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (12, 3), (20, 21)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in [1, 2, 3, 4, 10, 11, 12, 20, 21, 30]], "doc_id long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 1, 11: 1, 12: 1,
                   20: 20, 21: 20, 30: 30}


def test_connected_components_long_chain_converges(spark):
    """A 20-hop chain needs ~diameter rounds; must still fixpoint exactly."""
    from helix_spark.operators.textdedup import connected_components

    n = 21
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    got = connected_components(pairs, nodes).collect()
    assert all(r["component"] == 1 for r in got) and len(got) == n


def test_connected_components_empty_pairs(spark):
    from helix_spark.operators.textdedup import connected_components

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {r["doc_id"]: r["component"] for r in connected_components(pairs, nodes).collect()}
    assert got == {1: 1, 2: 2}


def test_connected_components_path_graph_log_rounds(spark):
    """The adversarial case for min-label propagation: a 10^4-node path
    needs ~diameter rounds there; the alternating large-star/small-star
    algorithm must converge in ≤ 2·log₂(n) rounds — and exactly."""
    import math

    from helix_spark.operators.textdedup import connected_components

    n = 10_000
    pairs = spark.range(1, n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    nodes = spark.range(1, n + 1).select(F.col("id").alias("doc_id"))
    rounds: list[int] = []
    got = connected_components(
        pairs, nodes, driver_max_edges=0, _rounds_out=rounds
    ).collect()
    assert len(got) == n and all(r["component"] == 1 for r in got)
    assert rounds[0] <= 2 * math.log2(n)


def test_connected_components_driver_path_matches_distributed(spark):
    """The small-graph driver union-find (round-6) must produce labels
    identical to the distributed star rounds, including dup/reversed
    pairs, bridges, and singletons; and the cap must route correctly."""
    from helix_spark.operators.textdedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (5, 4), (7, 7), (9, 8), (8, 6)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in range(1, 11)], "doc_id long"
    )
    rounds_drv: list[int] = []
    drv = {
        r["doc_id"]: r["component"]
        for r in connected_components(
            pairs, nodes, _rounds_out=rounds_drv
        ).collect()
    }
    dist = {
        r["doc_id"]: r["component"]
        for r in connected_components(
            pairs, nodes, driver_max_edges=0
        ).collect()
    }
    assert rounds_drv == [0]  # cap engaged: no distributed rounds ran
    assert drv == dist == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7,
                           8: 6, 9: 6, 10: 10}
    # a cap below the edge count must route to the distributed path
    rounds_small: list[int] = []
    via_dist = {
        r["doc_id"]: r["component"]
        for r in connected_components(
            pairs, nodes, driver_max_edges=2, _rounds_out=rounds_small
        ).collect()
    }
    assert rounds_small and rounds_small[0] > 0
    assert via_dist == drv


def test_connected_components_raises_on_nonconvergence(spark):
    """Partial labels would corrupt a keep-one-per-cluster dedup — the
    operator must refuse rather than return them (ADVICE round 3)."""
    from helix_spark.operators.textdedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 41)], "doc_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, nodes, max_iters=1, driver_max_edges=0)


SIMHASH_TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "the quick brown fox jumps over the lazy dog again and again",  # exact copy
    "the quick brown fox jumps over the lazy cat again and again",  # near
    "a completely different document about spark shuffle partitions",
    "another unrelated text mentioning bloom filters and frontiers",
]


def test_simhash_near_dup_pigeonhole_exact(spark):
    """With bands > max_hamming and both scale guards off, the banded
    candidate set provably covers every pair within the radius — the output
    must equal the brute-force all-pairs Hamming answer exactly."""
    from helix_spark.operators.textdedup import simhash64, simhash_near_dup_pairs

    texts = SIMHASH_TEXTS
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(
            docs, bits=16, bands=4, max_hamming=3, collapse_identical=False
        ).collect()
    }
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs, bits=16).collect()}
    expect = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            h = bin(sims[i] ^ sims[j]).count("1")
            if h <= 3:
                expect[(i, j)] = h
    assert got == expect
    assert got[(0, 1)] == 0  # exact copies at hamming 0


def test_simhash_collapse_preserves_components(spark):
    """collapse_identical changes the pair ROWS (rep-level cross pairs +
    hamming-0 stars) but must leave the component structure identical to
    the raw all-pairs output — the property the dedup consumer relies on."""
    from helix_spark.operators.textdedup import (
        connected_components,
        simhash_near_dup_pairs,
    )

    # duplicate-heavy corpus: several copies of each base text
    texts = [(i * 10 + c, t) for i, t in enumerate(SIMHASH_TEXTS) for c in range(3)]
    docs = spark.createDataFrame(texts, "doc_id long, text string").localCheckpoint()
    nodes = docs.select("doc_id")

    def comps(pairs):
        return {
            r["doc_id"]: r["component"]
            for r in connected_components(pairs, nodes).collect()
        }

    raw = comps(simhash_near_dup_pairs(
        docs, bits=16, bands=4, max_hamming=3, collapse_identical=False))
    collapsed = comps(simhash_near_dup_pairs(
        docs, bits=16, bands=4, max_hamming=3, collapse_identical=True))
    assert collapsed == raw
    # and the collapsed pair list is strictly smaller on this corpus
    n_raw = simhash_near_dup_pairs(
        docs, bits=16, bands=4, max_hamming=3, collapse_identical=False).count()
    n_col = simhash_near_dup_pairs(
        docs, bits=16, bands=4, max_hamming=3, collapse_identical=True).count()
    assert n_col < n_raw


def test_simhash_degenerate_corpus_linear(spark):
    """All-identical corpus — the blowup the collapse guard exists for:
    n docs on ONE signature must come back as exactly n−1 hamming-0 star
    pairs (rep = min id), i.e. O(n) output, not n(n−1)/2."""
    from helix_spark.operators.textdedup import simhash_near_dup_pairs

    n = 3000
    clones = spark.createDataFrame(
        [(i, "same boilerplate text repeated everywhere again and again")
         for i in range(1, n + 1)],
        "doc_id long, text string",
    )
    rows = simhash_near_dup_pairs(clones).collect()  # production defaults
    assert len(rows) == n - 1
    assert all(r["id_a"] == 1 and r["hamming"] == 0 for r in rows)
    assert {r["id_b"] for r in rows} == set(range(2, n + 1))


def test_simhash_near_dup_bucket_cap_star_rule(spark):
    """max_bucket_size: over-cap (band, slice) buckets emit star candidates
    (bucket min id × member) which still pass the Hamming verify — checked
    against a Python replication of the exact star rule."""
    from helix_spark.operators.textdedup import simhash64, simhash_near_dup_pairs

    bits, bands, radius, cap = 16, 4, 3, 1
    docs = spark.createDataFrame(
        list(enumerate(SIMHASH_TEXTS)), "doc_id long, text string"
    ).localCheckpoint()
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs, bits=bits).collect()}
    width = bits // bands
    mask = (1 << width) - 1
    cand = set()
    for b in range(bands):
        buckets: dict[int, list[int]] = {}
        for d, s in sims.items():
            buckets.setdefault((s >> (b * width)) & mask, []).append(d)
        for members in buckets.values():
            members.sort()
            if len(members) <= cap:
                cand.update(
                    (members[i], members[j])
                    for i in range(len(members))
                    for j in range(i + 1, len(members))
                )
            else:
                cand.update((members[0], m) for m in members[1:])
    expect = {
        (a, b): bin(sims[a] ^ sims[b]).count("1")
        for a, b in cand
        if bin(sims[a] ^ sims[b]).count("1") <= radius
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(
            docs, bits=bits, bands=bands, max_hamming=radius,
            collapse_identical=False, max_bucket_size=cap,
        ).collect()
    }
    assert got == expect


def test_simhash64_bits_range_guard(spark):
    from helix_spark.operators.textdedup import simhash64

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    with pytest.raises(ValueError, match="60"):
        simhash64(docs, bits=61)
    with pytest.raises(ValueError, match="60"):
        simhash64(docs, bits=0)
    # full 60-bit width works and stays a positive long
    val = simhash64(docs, bits=60).collect()[0]["simhash"]
    assert 0 <= val < 1 << 60
