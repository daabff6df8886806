"""Scalable deterministic global rank — replaces the reference's
IncrementalIdGenerator (/root/reference/Bot/Business/IncrementalIdGenerator.cs:17).

``monotonically_increasing_id`` is not deterministic across runs and a global
``row_number() OVER (ORDER BY ...)`` funnels everything through ONE task.
This primitive stays entirely JVM-side (an earlier mapInPandas version moved
every row through Python/Arrow — it flattened N→4N scaling):

1. range-repartition by the order columns (distributed, deterministic)
2. count rows per range partition (small collect: P longs)
3. rank = row_number() windowed WITHIN each range partition + that
   partition's cumulative offset (a when-chain over ≤P literals)

Two distributed passes, no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        off_expr = None
        for pid, off in offsets.items():
            cond = F.col("__pid") == pid
            off_expr = (
                F.when(cond, F.lit(off)) if off_expr is None else off_expr.when(cond, F.lit(off))
            )
        off_expr = off_expr.otherwise(F.lit(offset))
    else:
        off_expr = F.lit(offset)
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    out = parted.withColumn(
        rank_col, (F.row_number().over(w) - 1 + off_expr).cast("long")
    ).drop("__pid")
    return out, counts
