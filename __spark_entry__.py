"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in helix_spark.entry_queries (one entry per operator
from SURVEY.md §2 plus the training-data pipeline operators); the crawl
engine itself is verified separately against the serial oracle in
tests/test_crawl_parity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the politeness batch
    selector (per-key budgeted top-k window) — the heart of the crawl
    scheduler — over the events table."""
    from helix_spark.entry_queries import q_per_host_topk

    return q_per_host_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from helix_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from helix_spark.entry_queries import build_oracles

    return build_oracles()
