"""Scalable deterministic global rank — replaces the reference's
IncrementalIdGenerator (/root/reference/Bot/Business/IncrementalIdGenerator.cs:17).

``monotonically_increasing_id`` is not deterministic across runs and a global
``row_number() OVER (ORDER BY ...)`` funnels everything through ONE task. This
primitive gets a total order without the single-task bottleneck:

1. range-repartition by the order columns (distributed sort)
2. sort within partitions
3. count rows per partition (small collect: P longs)
4. mapInPandas adds rank = partition_offset + local position

Two jobs over the batch (cached in between), all heavy work distributed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "priority",
    offset: int = 0,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[int, int]]:
    """Add a 0-based dense global rank (plus ``offset``) by ``order_cols``.
    Returns (df, per-partition row counts — free lineage metrics).
    Deterministic iff ``order_cols`` is a total order (include tiebreakers)."""
    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    parted = parted.persist()
    counts = {r["__pid"]: r["cnt"] for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)
    in_cols = [c for c in parted.columns if c != "__pid"]

    def add_rank(batches):
        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = bc.value[int(pdf["__pid"].iloc[0])]
            pdf = pdf.copy()
            pdf[rank_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf.drop(columns=["__pid"])

    schema = StructType(
        [f for f in parted.schema.fields if f.name != "__pid"] + [StructField(rank_col, LongType())]
    )
    out = parted.mapInPandas(add_rank, schema)
    return out, counts
