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


def _host_state(spark, hosts, delay_host=None):
    rows = [(h, 100 if h == delay_host else 0, -1) for h in hosts]
    return spark.createDataFrame(
        rows, "host string, next_allowed_wave int, cursor long"
    )


def test_non_broadcast_state_path_same_results(spark):
    """The web-scale host_state path (broadcast_state=False — #hosts past
    the driver/broadcast ceiling) must plan WITHOUT a broadcast of
    host_state (shuffle-hash join instead) and return bit-identical
    batches to the broadcast path, including delay-gated hosts."""
    f = _frontier(spark, hot_rows=500, cold_hosts=4)
    hosts = ["hot.test"] + [f"c{h}.test" for h in range(4)]
    hs = _host_state(spark, hosts, delay_host="c1.test")
    b_bcast = select_batch(f, hs, 0, 10, salt_partitions=1)
    b_shuf = select_batch(f, hs, 0, 10, salt_partitions=1, broadcast_state=False)
    plan_b = b_bcast._jdf.queryExecution().executedPlan().toString()
    plan_s = b_shuf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b
    # the host_state join itself must not broadcast; the shuffled-hash
    # operator takes its place
    assert "ShuffledHashJoin" in plan_s and "BroadcastHashJoin" not in plan_s
    a = {(r["host"], r["priority"]) for r in b_bcast.collect()}
    b = {(r["host"], r["priority"]) for r in b_shuf.collect()}
    assert a == b
    assert not any(h == "c1.test" for h, _ in a)  # delay gate still applies
