"""State layer: snapshot warehouse, bloom, cuckoo."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from helix_spark.state.bloom import PartitionedBloom
from helix_spark.state.cuckoo import CuckooFilter
from helix_spark.state.tables import SnapshotWarehouse


def test_bloom_no_false_negatives_and_low_fp(spark):
    rng = np.random.default_rng(7)
    present = rng.integers(-(2**62), 2**62, 5000, dtype=np.int64)
    absent = rng.integers(-(2**62), 2**62, 5000, dtype=np.int64)
    absent = np.setdiff1d(absent, present)
    bloom = PartitionedBloom.sized_for(10_000, p=1e-3, num_slices=8)
    df = spark.createDataFrame([(int(h),) for h in present], ["url_hash"])
    bloom.build_update(df)
    assert bloom.contains_hashes(present).all(), "bloom false negative!"
    fp_rate = bloom.contains_hashes(absent).mean()
    assert fp_rate < 0.01, f"fp rate too high: {fp_rate}"


def test_bloom_probe_col_and_serde(spark):
    hashes = list(range(-100, 100, 3))
    df = spark.createDataFrame([(h,) for h in hashes], ["url_hash"])
    bloom = PartitionedBloom.sized_for(1000, num_slices=4)
    bloom.build_update(df)
    bloom2 = PartitionedBloom.from_rows(bloom.to_rows(wave=1))
    out = bloom2.probe_col(df).collect()
    assert all(r["maybe_seen"] for r in out)


def test_cuckoo_insert_contains_delete():
    rng = np.random.default_rng(11)
    xs = rng.integers(-(2**62), 2**62, 2000, dtype=np.int64)
    cf = CuckooFilter.sized_for(4000)
    failed = cf.insert_hashes(xs)
    assert failed == 0
    assert cf.contains_hashes(xs).all()
    others = np.setdiff1d(rng.integers(-(2**62), 2**62, 2000, dtype=np.int64), xs)
    assert cf.contains_hashes(others).mean() < 0.02
    half = xs[:1000]
    cf.delete_hashes(half)
    # deleted items mostly gone (duplicates of fingerprints may remain)
    assert cf.contains_hashes(half).mean() < 0.05
    assert cf.contains_hashes(xs[1000:]).all()
    rt = CuckooFilter.from_bytes(cf.num_buckets, cf.to_bytes())
    assert rt.contains_hashes(xs[1000:]).all()


def test_warehouse_append_commit_resume(spark, tmp_path):
    wh = SnapshotWarehouse(spark, str(tmp_path / "wh"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    m1 = wh.append("t", df1)
    wh.commit(wave=0, table_manifests={"t": m1})
    df2 = spark.createDataFrame([(3, "c")], ["k", "v"])
    m2 = wh.append("t", df2)
    wh.commit(wave=1, table_manifests={"t": m2})
    got = {(r["k"], r["v"]) for r in wh.read("t").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # resume: a fresh warehouse object sees HEAD state
    wh2 = SnapshotWarehouse(spark, str(tmp_path / "wh"))
    assert wh2.head_commit()["wave"] == 1
    assert wh2.read("t").count() == 3


def test_warehouse_merge_upsert_bucket_cow(spark, tmp_path):
    wh = SnapshotWarehouse(spark, str(tmp_path / "wh2"))
    base = spark.createDataFrame([(i, f"v{i}") for i in range(50)], ["k", "v"])
    m1 = wh.merge_upsert("r", base, key="k", num_buckets=8)
    wh.commit(0, {"r": m1})
    updates = spark.createDataFrame([(5, "NEW5"), (99, "NEW99")], ["k", "v"])
    m2 = wh.merge_upsert("r", updates, key="k", num_buckets=8)
    wh.commit(1, {"r": m2})
    rows = {r["k"]: r["v"] for r in wh.read("r").collect()}
    assert len(rows) == 51
    assert rows[5] == "NEW5" and rows[99] == "NEW99" and rows[6] == "v6"
    # bucket pruning read returns a subset
    some = wh.read("r", buckets=[0, 1])
    assert 0 < some.count() < 51


def test_warehouse_commit_atomic_head(spark, tmp_path):
    wh = SnapshotWarehouse(spark, str(tmp_path / "wh3"))
    assert wh.head_commit() is None
    df = spark.createDataFrame([(1,)], ["k"])
    m = wh.overwrite("x", df)
    n = wh.commit(0, {"x": m}, metrics={"rows": 1})
    assert n == 1
    head = wh.head_commit()
    assert head["metrics"]["rows"] == 1 and head["tables"]["x"] == m


def test_append_bucketed_and_compaction(spark, tmp_path):
    from pyspark.sql import functions as F

    wh = SnapshotWarehouse(spark, str(tmp_path / "lsm"))
    # 12 appends with overlapping keys and rising versions
    for v in range(12):
        df = spark.createDataFrame(
            [(f"k{i}", v, f"val{v}" if v % 2 else None) for i in range(20)],
            "key string, wave int, status string",
        )
        m = wh.append_bucketed("t", df, key="key", num_buckets=4)
        wh.commit(v, {"t": m})
    before = wh.read("t")
    assert before.count() == 240  # all versions retained pre-compaction
    m = wh.compact_bucketed("t", version_col="wave", prefer_nonnull="status",
                            max_files_per_bucket=3)
    assert m is not None
    wh.commit(99, {"t": m})
    after = wh.read("t")
    assert after.count() == 20  # one latest row per key
    rows = {r["key"]: (r["wave"], r["status"]) for r in after.collect()}
    assert all(v == (11, "val11") for v in rows.values())
    # second compaction is a no-op (file counts now below threshold)
    assert wh.compact_bucketed("t", version_col="wave", max_files_per_bucket=3) is None


def test_ranged_live_buckets_prunes_host_state_read(spark, tmp_path):
    """The frontier manifest knows which host-hash buckets still hold live
    rows; a host_state table sharing the bucket spec restricts its read to
    those buckets — fully-consumed buckets cost zero IO on BOTH tables."""
    wh = SnapshotWarehouse(spark, str(tmp_path / "p"))
    hosts = [f"h{i}.test" for i in range(8)]
    rows = spark.createDataFrame(
        [(i, hosts[i % 8]) for i in range(64)], "priority long, host string"
    )
    mf = wh.append_ranged("frontier", rows, "priority", range_bits=3,
                          bucket_col="host", num_buckets=4)
    hs = spark.createDataFrame(
        [(h, 0, -1, 0) for h in hosts],
        "host string, next_allowed_wave int, cursor long, wave int",
    )
    mh = wh.overwrite_bucketed("host_state", hs, "host", 4)
    wh.commit(0, {"frontier": mf, "host_state": mh})

    hb_of = {
        r["host"]: r["hb"]
        for r in spark.createDataFrame([(h,) for h in hosts], "host string")
        .select("host", F.pmod(F.xxhash64("host"), F.lit(4)).cast("int").alias("hb"))
        .collect()
    }
    dead = hb_of[hosts[0]]
    live = wh.ranged_live_buckets("frontier", bucket_mins={dead: 10_000})
    assert dead not in live and live  # that bucket's leaves are all consumed
    pruned = wh.read("host_state", buckets=live)
    got = {r["host"] for r in pruned.collect()}
    assert got == {h for h, b in hb_of.items() if b != dead}
    assert len(pruned.inputFiles()) < len(wh.read("host_state").inputFiles())
