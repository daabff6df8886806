"""Structured Streaming surface: availableNow stream results must equal the
same transformation applied in batch."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from helix_spark.streaming import events as se

TESTDATA = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{TESTDATA}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_windowed_counts_stream_equals_batch(spark, stream_dir):
    stream = se.read_event_stream(spark, stream_dir)
    got = se.run_available_now(se.windowed_counts(stream), "t_wc").collect()
    batch = spark.read.parquet(stream_dir)
    want = se.windowed_counts(batch).collect()
    key = lambda r: (r["window_start"], r["event_type"])
    assert sorted((key(r), r["n"]) for r in got) == sorted((key(r), r["n"]) for r in want)
    assert len(got) > 10


def test_dedup_stream(spark, stream_dir):
    stream = se.read_event_stream(spark, stream_dir)
    got = se.run_available_now(se.dedup_stream(stream), "t_dd")
    n_batch = spark.read.parquet(stream_dir).select("event_id").distinct().count()
    assert got.count() == n_batch


def test_sessionize_stream_equals_batch(spark, stream_dir):
    stream = se.read_event_stream(spark, stream_dir)
    got = se.run_available_now(se.sessionize_stream(stream), "t_ss").collect()
    want = se.sessionize_stream(spark.read.parquet(stream_dir)).collect()
    key = lambda r: (r["user_id"], r["session_start"], r["n_events"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) > 50


def test_first_seen_stateful_stream(spark, stream_dir):
    """Custom stateful op (applyInPandasWithState): per key, the emitted
    first_event_id must equal the batch first-wins row and n_suppressed
    must equal count−1 (the LAST update row per key carries final state)."""
    stream = se.read_event_stream(spark, stream_dir)
    q = (
        se.first_seen_stream(stream)
        .writeStream.format("memory")
        .queryName("t_fs")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("t_fs").collect()
    # keep the final (max n_suppressed) row per key — update mode emits one
    # row per key per micro-batch in which the key appeared
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_suppressed"] > cur["n_suppressed"]:
            final[r["user_id"]] = r
    batch = spark.read.parquet(stream_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want_first = {
        r["user_id"]: r["event_id"]
        for r in batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    want_counts = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(final) == set(want_first)
    for uid, r in final.items():
        assert r["first_event_id"] == want_first[uid], uid
        assert r["n_suppressed"] == want_counts[uid] - 1, uid
