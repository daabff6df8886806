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
