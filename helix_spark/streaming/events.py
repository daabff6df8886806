"""Structured Streaming surface.

The reference is a feedback-loop batch system — its cyclic dataflow cannot
be a streaming DAG (SURVEY.md §3.4), so the crawl runs as an iterative batch
wave loop. Streaming still matters to the engine in two places:

1. continuous ingestion of *new seed/frontier feeds* (a crawl discovers its
   input over time) — modeled here as a parquet-directory stream of events;
2. live metrics: the per-wave `metrics`/`crawl_log` tables are append-only
   and stream naturally to a monitoring sink.

All transformations below are plain DataFrame ops, so each works identically
on a batch frame (tests exploit this: availableNow stream == batch result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event counts with late-data watermarking."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming first-wins dedup on event_id — the seen-set TryAdd analog
    for a continuous feed (state bounded by the watermark)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Session windows per user with the built-in session_window function."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def seed_feed_query(engine, urls_stream: DataFrame, checkpoint_dir: str):
    """Continuous seed ingestion into a crawl: each micro-batch of a URL
    stream (column ``url``) is admitted through the engine's full pipeline
    (CrawlEngine.enqueue_urls — dedup vs seen, robots, bloom), committing
    one warehouse snapshot per batch. Drive the crawl by alternating
    engine.run(resume=True) with the stream's progress, or drain a backlog
    with trigger(availableNow)."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            engine.enqueue_urls(batch_df.select("url"))

    return (
        urls_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


FIRST_SEEN_SCHEMA = (
    "user_id long, first_event_id long, first_ts timestamp, n_suppressed long"
)


def first_seen_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The crawl's seen-set TryAdd as a CUSTOM stateful streaming operator
    (applyInPandasWithState): per key, emit the first event ever seen and
    keep a running count of suppressed duplicates in state. This is the
    shape dropDuplicates cannot express (it emits nothing for dupes; here
    the state carries an aggregate across them).

    State per key: (first_event_id, first_ts_epoch, n_total). Emits one row
    per key per micro-batch in which that key appeared (first_* frozen from
    the first arrival, n_suppressed monotone) — outputMode='update' shape.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.exists:
            first_id, first_ts, n = state.get
        else:
            first_id, first_ts, n = None, None, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            if first_id is None:
                first_id = int(pdf["event_id"].iloc[0])
                first_ts = int(pdf["ts"].iloc[0].value // 1_000_000_000)
            n += len(pdf)
        state.update((first_id, first_ts, n))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "first_event_id": [first_id],
                "first_ts": [pd.Timestamp(first_ts, unit="s")],
                "n_suppressed": [n - 1],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType="first_event_id long, first_ts long, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(stream_df: DataFrame, name: str, timeout_sec: int = 120) -> DataFrame:
    """Drain the stream with trigger(availableNow) into a memory sink and
    return the result as a DataFrame (test/inspection helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if stream_df.isStreaming and _has_agg(stream_df) else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    spark = stream_df.sparkSession
    return spark.table(name)


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan
