"""Politeness batch selector: salted two-phase top-k exactness + adaptive
engagement (the skew guard costs a second shuffle, so it must only engage
when a hot host could actually straggle the final reduce task)."""

from __future__ import annotations

from pyspark.sql import functions as F

from helix_spark.operators.politeness import select_batch


def _frontier(spark, hot_rows=5000, cold_hosts=8, cold_rows=50):
    rows = [(f"http://hot.test/p/{i}", i, "hot.test") for i in range(hot_rows)]
    p = hot_rows
    for h in range(cold_hosts):
        for i in range(cold_rows):
            rows.append((f"http://c{h}.test/p/{i}", p, f"c{h}.test"))
            p += 1
    df = spark.createDataFrame(rows, "url string, priority long, host string")
    return df.withColumn("url_hash", F.xxhash64("url")).repartition(8)


def test_salted_topk_exact_on_skewed_frontier(spark):
    """One host with 100× the rows of every other: the salted two-phase
    result must equal the single-window exact top-k bit-for-bit."""
    f = _frontier(spark)
    exact = select_batch(f, None, 0, 40, salt_partitions=1)
    salted = select_batch(f, None, 0, 40, salt_partitions=8, salt_reduce_threshold=0)
    a = {(r["host"], r["priority"]) for r in exact.collect()}
    b = {(r["host"], r["priority"]) for r in salted.collect()}
    assert a == b and len(a) == 40 * 9


def test_salt_phase_caps_reduce_fanin(spark):
    """With the salt engaged, the final per-host window's input is capped at
    salt_partitions·budget rows for the hot host (phase 1 prunes the rest):
    verify via the phase-1 semantics — every surviving hot row is within the
    per-salt top-k."""
    f = _frontier(spark)
    salted = select_batch(f, None, 0, 10, salt_partitions=4, salt_reduce_threshold=0)
    hot = [r["priority"] for r in salted.filter(F.col("host") == "hot.test").collect()]
    # exact top-10 of the hot host is 0..9 regardless of salting
    assert sorted(hot) == list(range(10))


def test_salt_phase_skipped_when_no_straggler_risk(spark):
    """Small worst-case reduce fan-in → single-window plan (one shuffle):
    the salted phase must NOT appear in the physical plan."""
    f = _frontier(spark, hot_rows=200)
    batch = select_batch(f, None, 0, 10, salt_partitions=8,
                         salt_reduce_threshold=10**9)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "__salt" not in plan
    assert batch.filter(F.col("host") == "hot.test").count() == 10


def test_salt_phase_engaged_past_threshold(spark):
    f = _frontier(spark, hot_rows=200)
    batch = select_batch(f, None, 0, 10, salt_partitions=8, salt_reduce_threshold=0)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
