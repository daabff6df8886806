"""Ranged-LSM warehouse tables (the append-only frontier's storage) and the
non-power-of-two bloom slice fix."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from helix_spark.state.bloom import PartitionedBloom
from helix_spark.state.tables import SnapshotWarehouse


def _wh(spark, tmp_path) -> SnapshotWarehouse:
    return SnapshotWarehouse(spark, str(tmp_path / "wh"))


def test_append_ranged_and_read(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    df1 = spark.range(0, 100).select(F.col("id").alias("priority"), F.lit("a").alias("v"))
    m1 = wh.append_ranged("t", df1, range_col="priority", range_bits=5)  # ranges of 32
    wh.commit(0, {"t": m1})
    df2 = spark.range(100, 130).select(F.col("id").alias("priority"), F.lit("b").alias("v"))
    m2 = wh.append_ranged("t", df2, range_col="priority", range_bits=5)
    wh.commit(1, {"t": m2})
    assert wh.read_ranged("t").count() == 130


def test_read_ranged_prunes_consumed_prefix(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    df = spark.range(0, 128).select(F.col("id").alias("priority"))
    wh.commit(0, {"t": wh.append_ranged("t", df, range_col="priority", range_bits=5)})
    # min_exclusive=63: ranges 0 (0-31) and 1 (32-63) are fully consumed
    out = wh.read_ranged("t", min_exclusive=63)
    vals = sorted(r["priority"] for r in out.collect())
    # pruning is manifest-level (range granularity): nothing below 64 remains
    assert vals[0] >= 64 and vals[-1] == 127 and len(vals) == 64
    # an intra-range bound keeps the whole boundary range (rows ≤ bound kept)
    out2 = wh.read_ranged("t", min_exclusive=40)
    assert sorted(r["priority"] for r in out2.collect())[0] == 32


def test_prune_ranged_zero_io_compaction(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    df = spark.range(0, 128).select(F.col("id").alias("priority"))
    wh.commit(0, {"t": wh.append_ranged("t", df, range_col="priority", range_bits=5)})
    m = wh.prune_ranged("t", min_exclusive=63)
    assert m is not None
    wh.commit(1, {"t": m})
    manifest = wh._load_manifest("t")
    assert sorted(int(k) for k in manifest["ranges"]) == [2, 3]
    assert wh.read_ranged("t").count() == 64
    # nothing prunable → None (no new manifest written)
    assert wh.prune_ranged("t", min_exclusive=63) is None


def test_bloom_non_power_of_two_slices(spark):
    """Build (Spark pmod on signed int64) and probe (numpy) must agree on
    slice assignment for negative hashes when num_slices is NOT a power of
    two — the round-1 bug made such hashes bloom-false-NEGATIVE, silently
    re-admitting seen URLs."""
    rng = np.random.default_rng(3)
    present = rng.integers(-(2**62), 2**62, 4000, dtype=np.int64)
    bloom = PartitionedBloom.sized_for(8000, p=1e-3, num_slices=10)  # not 2^k
    df = spark.createDataFrame([(int(h),) for h in present], ["url_hash"])
    bloom.build_update(df)
    assert bloom.contains_hashes(present).all(), "false negative at P=10"


def test_bloom_driver_light_merge_and_probe(spark, tmp_path):
    """Handle mode: build+merge+persist executor-side across two waves;
    the driver never holds slices (slices is None); probe stays exact."""
    import os

    rng = np.random.default_rng(5)
    w1 = rng.integers(-(2**62), 2**62, 2000, dtype=np.int64)
    w2 = rng.integers(-(2**62), 2**62, 2000, dtype=np.int64)
    absent = np.setdiff1d(
        rng.integers(-(2**62), 2**62, 2000, dtype=np.int64), np.concatenate([w1, w2])
    )
    sized = PartitionedBloom.sized_for(8000, p=1e-3, num_slices=8)
    bloom = PartitionedBloom(
        sized.num_slices, sized.bits_per_slice, sized.num_hashes, handle=True
    )
    assert bloom.slices is None

    def df_of(h):
        return spark.createDataFrame([(int(x),) for x in h], ["url_hash"])

    bloom.merge_update_spark(df_of(w1), str(tmp_path / "b1"))
    bloom.merge_update_spark(df_of(w2), str(tmp_path / "b2"))
    # wave-2 dirs must be merged (contain wave-1 bits too)
    probe = df_of(np.concatenate([w1, w2, absent[:1000]]))
    got = {r["url_hash"]: r["m"] for r in bloom.probe_col(probe, out_col="m").collect()}
    assert all(got[int(h)] for h in w1), "false negative on wave-1 keys after merge"
    assert all(got[int(h)] for h in w2), "false negative on wave-2 keys"
    fp = sum(got[int(h)] for h in absent[:1000]) / 1000
    assert fp < 0.01, f"fp rate {fp}"
    assert all(os.path.exists(p) for p in bloom.slice_paths.values())


def test_bloom_slice_affine_probe_matches_broadcast(spark, tmp_path):
    """The slice-affine probe (per-slice parquet blobs, no broadcast) must
    return exactly the broadcast probe's answers."""
    import os

    rng = np.random.default_rng(11)
    present = rng.integers(-(2**62), 2**62, 3000, dtype=np.int64)
    absent = np.setdiff1d(rng.integers(-(2**62), 2**62, 3000, dtype=np.int64), present)
    bloom = PartitionedBloom.sized_for(6000, p=1e-3, num_slices=8)
    df = spark.createDataFrame([(int(h),) for h in present], ["url_hash"])
    bloom.build_update(df)

    d = str(tmp_path / "bloom")
    rows = spark.createDataFrame(
        bloom.to_rows(0),
        "wave int, slice_id int, num_slices int, bits long, hashes int, blob binary",
    ).repartition(F.col("slice_id"))
    rows.write.mode("overwrite").partitionBy("slice_id").parquet(d)
    slice_paths = {i: os.path.join(d, f"slice_id={i}") for i in range(8)}

    probe_df = spark.createDataFrame(
        [(int(h),) for h in np.concatenate([present[:500], absent[:500]])], ["url_hash"]
    )
    broadcast = {
        r["url_hash"]: r["m"]
        for r in bloom.probe_col(probe_df, out_col="m").collect()
    }
    sliced = {
        r["url_hash"]: r["m"]
        for r in bloom.probe_col(
            probe_df, out_col="m", slice_paths=slice_paths, broadcast_max_bytes=0
        ).collect()
    }
    assert sliced == broadcast
    assert all(sliced[int(h)] for h in present[:500])


def test_ranged_per_bucket_pruning(spark, tmp_path):
    """A lagging host must keep only ITS host-bucket's dead ranges alive:
    pruning with per-bucket cursors drops the other buckets' consumed
    leaves (the global-min design kept every dead range for everyone)."""
    from pyspark.sql import functions as F

    wh = SnapshotWarehouse(spark, str(tmp_path))
    hosts = [f"h{i}.test" for i in range(6)]
    hb = {
        r["h"]: r["b"]
        for r in spark.createDataFrame([(h,) for h in hosts], "h string")
        .select("h", F.pmod(F.xxhash64("h"), F.lit(4)).cast("int").alias("b"))
        .collect()
    }
    lag = hosts[0]
    rows = [(p, h) for p in range(128) for h in hosts]
    df = spark.createDataFrame(rows, "priority long, host string")
    m = wh.append_ranged("t", df, range_col="priority", range_bits=5,
                         bucket_col="host", num_buckets=4)
    wh.commit(0, {"t": m})
    # every bucket consumed past priority 63 except the lagging host's
    mins = {b: 63 for b in range(4)}
    mins[hb[lag]] = -1
    out = wh.read_ranged("t", bucket_mins=mins)
    got_hosts = {r["host"] for r in out.filter(F.col("priority") < 64).collect()}
    # ranges 0-1 survive ONLY in the lagging host's bucket
    assert all(hb[h] == hb[lag] for h in got_hosts)
    assert lag in got_hosts
    # rows above every cursor survive everywhere
    assert out.filter(F.col("priority") > 63).select("host").distinct().count() == 6
    # prune is a manifest edit that keeps the lagging bucket's leaves
    assert wh.prune_ranged("t", bucket_mins=mins) is not None
    out2 = wh.read_ranged("t", bucket_mins=mins)
    assert lag in {r["host"] for r in out2.filter(F.col("priority") < 64).collect()}
    # unknown bucket -> conservatively kept
    out3 = wh.read_ranged("t", bucket_mins={})
    assert out3.count() == df.count()


def test_append_ranged_rejects_modulus_change(spark, tmp_path):
    """Resuming with a changed frontier_host_buckets must FAIL FAST: old
    leaves keep __hb labels hashed under the old modulus, so accepting the
    new one would let cursor pruning drop leaves with live rows (silent URL
    loss — round-3 ADVICE)."""
    import pytest

    wh = _wh(spark, tmp_path)
    df = spark.createDataFrame(
        [(p, f"h{p % 3}.test") for p in range(64)], "priority long, host string"
    )
    m = wh.append_ranged("t", df, range_col="priority", range_bits=5,
                         bucket_col="host", num_buckets=4)
    wh.commit(0, {"t": m})
    with pytest.raises(ValueError, match="num_buckets mismatch"):
        wh.append_ranged("t", df, range_col="priority", range_bits=5,
                         bucket_col="host", num_buckets=8)
    # the authoritative modulus is readable for the consumer side
    assert wh.ranged_bucket_spec("t") == ("host", 4)


def test_flat_manifest_bucket_mins_fallback(spark, tmp_path):
    """A legacy FLAT ranged manifest driven by a per-bucket caller must
    fall back to the global cursor (min over buckets) — pruning keeps
    working on resume instead of silently keeping everything."""
    wh = _wh(spark, tmp_path)
    df = spark.range(0, 128).select(F.col("id").alias("priority"))
    wh.commit(0, {"t": wh.append_ranged("t", df, range_col="priority", range_bits=5)})
    out = wh.read_ranged("t", bucket_mins={0: 63, 1: 90})  # global min = 63
    vals = sorted(r["priority"] for r in out.collect())
    assert vals[0] >= 64 and len(vals) == 64
    # empty bucket_mins on a flat manifest: no cursor info -> keep all
    assert wh.read_ranged("t", bucket_mins={}).count() == 128


def test_ranged_leaf_count_matches_read(spark, tmp_path):
    """ranged_leaf_count must agree with what read_ranged would scan —
    the wave loop sizes its select shuffle from it without any RDD work."""
    wh = _wh(spark, tmp_path)
    df = spark.createDataFrame(
        [(p, f"h{p % 3}.test") for p in range(128)], "priority long, host string"
    )
    m = wh.append_ranged("t", df, range_col="priority", range_bits=5,
                         bucket_col="host", num_buckets=4)
    wh.commit(0, {"t": m})
    manifest = wh._load_manifest("t")
    full = sum(
        len(ds) for e in manifest["ranges"].values() for ds in e.values()
    )
    assert wh.ranged_leaf_count("t") == full > 0
    mins = {b: 63 for b in range(4)}
    pruned = wh.ranged_leaf_count("t", bucket_mins=mins)
    assert 0 < pruned < full
    assert wh.ranged_leaf_count("missing") == 0
