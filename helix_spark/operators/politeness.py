"""Per-host politeness priority queue — the north-rule scheduler.

Replaces the reference's renderer-lease JoinBlock backpressure
(/root/reference/Bot/Workflow/BrokenLinkCollectionWorkflow.cs:37) with a
batch selector:

- robots gate: broadcast join against the (small) robots table; a URL whose
  path starts with a disallowed prefix for its host is rejected at admission
  (status −104, reported, recorded in seen — our extension; the reference
  has no robots support).
- crawl-delay gate: host_state.next_allowed_wave ≤ current wave (logical
  clock — no wall-clock, tests stay deterministic).
- per-host budget: top-k per host by priority, SKEW-SAFE in two layers:
  Spark's WindowGroupLimit rule caps rows shipped per MAP partition at k,
  and an explicit salted phase 1 (window over (host, pmod(url_hash, S)),
  keep k per salt) bounds what any single REDUCE task sees for a hot host
  at S·k rows — phase 2 then takes the EXACT top-k per host over those
  survivors. Without the salt phase, a host with 10^7 live rows across
  thousands of map partitions funnels ≤ P·k rows into ONE reduce task;
  with it, the straggler is capped independent of frontier size. The salt
  key is url_hash (already computed, uniform), so the phase-1 result is
  deterministic and the final top-k is exactly the unsalted answer
  (priorities are globally unique — total order, no tie ambiguity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATUS_ROBOTS_DISALLOWED = -104  # helix-spark extension (no reference analog)


def robots_gate(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Adds boolean ``robots_blocked``. robots(host, disallow_prefixes,
    crawl_delay_waves) is small → broadcast."""
    path = F.regexp_replace(
        F.col("canonical_url"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*", ""
    )
    joined = candidates.join(
        F.broadcast(robots.select("host", "disallow_prefixes")), on="host", how="left"
    )
    blocked = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    return joined.withColumn("robots_blocked", F.coalesce(blocked, F.lit(False))).drop(
        "disallow_prefixes"
    )


def select_batch(
    frontier: DataFrame,
    host_state: DataFrame | None,
    wave: int,
    per_host_budget: int,
    salt_partitions: int = 16,
    salt_reduce_threshold: int = 1_000_000,
    input_splits: int | None = None,
    broadcast_state: bool = True,
) -> DataFrame:
    """→ batch = up to ``per_host_budget`` URLs per eligible host, lowest
    ``priority`` first.

    CURSOR CONSUMPTION MODEL (no remainder, no frontier rewrite): because
    each wave takes a host's LOWEST-priority live rows and priorities only
    ever grow (global monotonic counter), the consumed set per host is
    always a priority PREFIX. One number per host — ``cursor`` = the max
    priority ever batched — fully encodes consumption: a frontier row is
    live iff priority > cursor[host]. Selection is a broadcast join +
    filter + salted two-phase top-k window over the append-only frontier;
    nothing is ever anti-joined or rewritten (module docstring for the
    skew story)."""
    if host_state is not None:
        # ``broadcast_state``: host_state is one row per host — broadcast is
        # right up to millions of hosts, but at web scale (#hosts ≫ the
        # broadcast/driver ceiling) the caller flips this off (size-aware,
        # same adaptive pattern as the seen join) and the join runs as a
        # SHUFFLE_HASH join instead: host_state partitions build the hash
        # maps, the frontier streams — no driver collect, no sort of the
        # frontier. True shuffle-FREE co-location of the host-hash-bucketed
        # frontier with a bucketed host_state needs storage-partitioned
        # joins (the documented Iceberg seam, state/tables.py).
        hs = F.broadcast(host_state) if broadcast_state else host_state.hint("shuffle_hash")
        f = frontier.join(hs, on="host", how="left")
        live = f.filter(F.col("priority") > F.coalesce(F.col("cursor"), F.lit(-1)))
        eligible = live.filter(
            F.coalesce(F.col("next_allowed_wave"), F.lit(0)) <= F.lit(wave)
        ).drop("next_allowed_wave", "cursor")
    else:
        eligible = frontier

    # The salted phase costs a SECOND full shuffle of the live set, so it
    # only pays when a hot host could actually straggle the final window's
    # reduce task. WindowGroupLimit partial pushdown already caps what each
    # MAP partition ships at k rows per host, so the worst reduce task sees
    # ≤ map_partitions·k rows for one host — engage the salt phase only
    # when that bound is big enough to hurt. ``input_splits`` is the
    # caller's map-side partition estimate (the crawl loop passes the live
    # LEAF-DIR count straight off the warehouse manifest — zero plan/RDD
    # work; leaves may coalesce into fewer actual splits, which only
    # over-engages the salt: scale-safe). Only ad-hoc callers without a
    # manifest fall back to the rdd-conversion probe. Measured:
    # unconditional salting cost ~60% extra select time at bench scale.
    worst_reduce_rows = None
    if salt_partitions and salt_partitions > 1:
        if input_splits is not None:
            worst_reduce_rows = input_splits * per_host_budget
        else:
            try:
                worst_reduce_rows = frontier.rdd.getNumPartitions() * per_host_budget
            except Exception:
                worst_reduce_rows = salt_reduce_threshold + 1  # engage (scale-safe)
    if worst_reduce_rows is not None and worst_reduce_rows > salt_reduce_threshold:
        # phase 1: per-(host, salt) top-k. WindowGroupLimit's partial
        # pushdown caps each MAP partition's output at k; the salted
        # partitioning caps each REDUCE task at k too. The true per-host
        # top-k rows are a subset of the per-salt top-k union, so phase 2
        # is exact.
        w1 = Window.partitionBy("host", "__salt").orderBy("priority")
        eligible = (
            eligible.withColumn(
                "__salt", F.pmod(F.col("url_hash"), F.lit(salt_partitions)).cast("int")
            )
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= per_host_budget)
            .drop("__salt", "__r1")
        )
    # phase 2: exact top-k per host over ≤ S·k survivors per host
    w = Window.partitionBy("host").orderBy("priority")
    return (
        eligible.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= per_host_budget)
        .drop("__rank")
    )


def host_state_updates(
    batch: DataFrame,
    robots: DataFrame | None,
    wave: int,
    host_state: DataFrame | None,
    new_hosts: DataFrame | None = None,
) -> DataFrame:
    """The CHANGED host_state rows only — the copy-on-write merge input.

    Hosts fetched this wave become eligible again at
    wave + 1 + crawl_delay_waves (logical clock), and their consumption
    ``cursor`` advances to the max priority batched (prefix property — see
    select_batch). ``new_hosts`` (hosts of freshly admitted frontier rows)
    are registered with cursor −1 so host_state covers EVERY frontier host:
    min(cursor) over host_state is then an exact global live-priority lower
    bound, which read_ranged uses to prune fully-consumed frontier ranges.

    ``host_state`` here only feeds the already-registered anti-join for new
    hosts — a bucket-pruned read (only the buckets the new hosts hash into)
    is sufficient and is what keeps this O(changed data) at 10^9 hosts.
    Fetched hosts are registered by the frontier invariant above, so every
    update row either overwrites an existing host row (fetched) or inserts
    a genuinely-new one (fresh) — MERGE semantics."""
    hosts = batch.groupBy("host").agg(F.max("priority").alias("cursor"))
    if robots is not None:
        hosts = hosts.join(
            F.broadcast(robots.select("host", "crawl_delay_waves")), on="host", how="left"
        )
    else:
        hosts = hosts.withColumn("crawl_delay_waves", F.lit(0))
    updated = hosts.select(
        "host",
        # pinned long: the natural type of this sum follows the caller's
        # robots schema (int or long crawl_delay_waves), and a mixed-width
        # host_state would re-insert cast Projects into the select plan's
        # committed∪delta composition on some waves (shape drift the
        # wave_plan_identity check rejects)
        (F.lit(wave + 1) + F.coalesce(F.col("crawl_delay_waves"), F.lit(0)))
        .cast("long").alias("next_allowed_wave"),
        F.col("cursor"),
    )
    if new_hosts is not None:
        fresh = (
            new_hosts.select("host").distinct()
            .join(updated.select("host"), on="host", how="left_anti")
            .select(
                "host",
                F.lit(0).cast("long").alias("next_allowed_wave"),
                F.lit(-1).cast("long").alias("cursor"),
            )
        )
        if host_state is not None:
            fresh = fresh.join(host_state.select("host"), on="host", how="left_anti")
        updated = updated.unionByName(fresh)
    return updated


def next_host_state(
    batch: DataFrame,
    robots: DataFrame | None,
    wave: int,
    host_state: DataFrame | None,
    new_hosts: DataFrame | None = None,
) -> DataFrame:
    """Full next host_state = carried-unchanged rows ∪ changed rows
    (host_state_updates). Used by the plain-overwrite write path while the
    host count is small; past cfg.host_state_cow_min_hosts the engine
    writes only the updates via bucket-level copy-on-write merge."""
    updated = host_state_updates(batch, robots, wave, host_state, new_hosts)
    if host_state is None:
        return updated
    carried = host_state.join(updated.select("host"), on="host", how="left_anti")
    return carried.unionByName(updated)
