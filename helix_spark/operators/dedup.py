"""URL-seen dedup — THE crawl optimization (never fetch a URL twice).

Reference semantics (/root/reference/Bot/Block/CoordinatorBlock.cs:235-264):
first-wins TryAdd against the seen set, serialized in arrival order. Spark
translation per wave:

1. first-wins WITHIN the wave's admission batch: row_number over url_hash
   ordered by admission order (parent_priority, seq) → keep rank 1
2. bloom prefilter (broadcast, mapInPandas probe): bloom-negative rows are
   DEFINITELY unseen → admitted without touching the seen table
3. bloom-positive rows go through the exact left-anti join against the
   bucketed `seen` table — and the read is PRUNED to the buckets the
   candidates hash into (SnapshotWarehouse.read(buckets=...))

A bloom false positive costs one join probe; it can never drop a URL.
At 10^10 seen URLs, step 2 removes ~99.9% of the anti-join's left side and
step 3's bucket pruning bounds the right side scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from helix_spark.state.bloom import PartitionedBloom
from helix_spark.state.tables import SnapshotWarehouse


def first_wins_in_batch(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """Keep the first row per key in admission order (TryAdd semantics
    within one wave).

    Implemented as groupBy + min_by(struct(all), struct(order)) instead of a
    row_number window: the aggregate gets a MAP-SIDE partial combine, so the
    shuffle carries ~one row per (partition, key) instead of every row —
    the window variant shuffles the full batch."""
    cols = df.columns
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    row_struct = F.struct(*[F.col(c) for c in cols])
    agg = df.groupBy(key).agg(F.min_by(row_struct, ord_struct).alias("__row"))
    return agg.select(*[F.col(f"__row.{c}").alias(c) for c in cols])


def anti_join_seen(
    candidates: DataFrame,
    warehouse: SnapshotWarehouse,
    bloom: PartitionedBloom | None,
    seen_table: str = "seen",
    key: str = "url_hash",
    seen_key: str = "key_hash",
    prune_buckets: bool = False,
    semi_broadcast_max_rows: int = 4_000_000,
    maybe_rows: int | None = None,
    seen_rows: int | None = None,
    bloom_min_ratio: int = 32,
) -> DataFrame:
    """candidates → subset whose ``key`` hash is NOT in the seen table
    (seen table column: ``seen_key``).

    The exact check avoids shuffling a large seen table. When the
    candidate set is BOTH small in absolute terms (``maybe_rows`` ≤
    ``semi_broadcast_max_rows``) and small RELATIVE to the seen table
    (maybe ≤ seen/8 — the steady state at 10^10 seen URLs), the join runs
    as scan-side semi + broadcast anti:

        hits = seen ⋉ broadcast(maybe_keys)   -- one columnar scan of seen,
                                              -- zero shuffle of 10^10 rows
        out  = maybe ▷ broadcast(hits)        -- hits ≤ |maybe|, tiny

    An anti-join is insensitive to right-side duplicates, so no distinct on
    either side. Outside that regime (giant backfill waves, young crawls
    where seen is comparable to the batch) a plain shuffle anti-join is
    strictly better: the two broadcasts are serial driver collects that
    anti-scale with thread count, while the shuffle is fully parallel. At
    true 10^10 scale the semi path's residual cost is one single-column
    scan of `seen` per wave; an Iceberg backend upgrades this to a
    storage-partitioned join (tables.py module docstring seam).

    ``prune_buckets`` additionally restricts the seen READ to the buckets
    the candidates hash into — worth it only for small, skewed candidate
    sets (resume requeues, targeted backfills); uniformly-hashed admission
    batches touch every bucket."""
    if not warehouse.exists(seen_table):
        return candidates
    # The bloom prefilter's regime is seen ≫ candidates (10^10 seen vs 10^6
    # waves: the probe removes ~all of the anti-join's left side). When seen
    # is merely comparable to the batch (young crawls, giant backfills) the
    # probe is pure overhead — an Arrow round-trip of every candidate row
    # through Python to save a seen-key shuffle of similar size — so it is
    # bypassed below this ratio. Correctness is unaffected either way (the
    # exact join is always the authority; the filter is maintained
    # regardless, so the probe re-engages as seen outgrows the waves).
    if (
        bloom is not None
        and maybe_rows is not None
        and seen_rows is not None
        and seen_rows < bloom_min_ratio * maybe_rows
    ):
        bloom = None
    if bloom is not None:
        probed = bloom.probe_col(candidates, hash_col=key, out_col="__maybe")
        definite_new = probed.filter(~F.col("__maybe")).drop("__maybe")
        maybe = probed.filter(F.col("__maybe")).drop("__maybe")
    else:
        definite_new = None
        maybe = candidates

    nb = warehouse.num_buckets(seen_table)
    buckets = None
    if nb and prune_buckets:
        buckets = [
            r["b"]
            for r in maybe.select(F.pmod(F.col(key), F.lit(nb)).cast("int").alias("b"))
            .distinct()
            .collect()
        ]
    seen = warehouse.read(seen_table, buckets=buckets)
    if seen is None:
        survivors = maybe
    else:
        seen_keys = seen.select(F.col(seen_key).alias(key))
        semi_ok = (
            maybe_rows is not None
            and maybe_rows <= semi_broadcast_max_rows
            and (seen_rows is None or maybe_rows * 8 <= seen_rows)
        )
        if semi_ok:
            hits = seen_keys.join(F.broadcast(maybe.select(key)), on=key, how="left_semi")
            survivors = maybe.join(F.broadcast(hits), on=key, how="left_anti")
        else:
            survivors = maybe.join(seen_keys, on=key, how="left_anti")
    if definite_new is not None:
        survivors = definite_new.unionByName(survivors.select(definite_new.columns))
    return survivors
