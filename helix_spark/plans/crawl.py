"""The Spark crawl engine — iterative-batch BFS over snapshot tables.

The reference's cyclic TPL-Dataflow DAG (Coordinator → Verifier → Renderer →
PostProcessor → Coordinator, /root/reference/Bot/Workflow/
BrokenLinkCollectionWorkflow.cs:44-76) has no acyclic-streaming equivalent;
the idiomatic Spark translation is a driver wave loop (SURVEY.md §3.4):

    wave: select batch (politeness window) → verify (ONE content-store join,
    redirect chains pre-resolved) → route (report / requeue / render) →
    extract + assets → admit (canonicalize, robots, bloom-prefiltered seen
    anti-join, global rank) → commit snapshot (frontier, seen, report,
    host_state, filters, metrics) → repeat until the frontier drains.

Every wave ends in ONE atomic warehouse commit; the next wave reads state
back from parquet — this both checkpoints (kill → resume from HEAD) and
truncates DataFrame lineage (no unbounded plan growth across iterations).

Scale posture: frontier/seen/report are hash-bucketed; the seen anti-join is
bloom-prefiltered and bucket-pruned; per-host top-k is salted two-phase;
joins against small dims (robots, host_state) broadcast; the content-store
join is a plain equi-join on url_hash that AQE can re-plan. Nothing ever
collects URLs to the driver — only counts and the tiny host/bucket lists.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from helix_spark.config import CrawlConfig
from helix_spark.functions.status import is_broken_col
from helix_spark.functions.urls import (
    STATUS_MALFORMED_URI,
    STATUS_URI_SCHEME_NOT_SUPPORTED,
    canonical_status_col,
    canonical_url_col,
    canonicalize_url_py,
)
from helix_spark.operators.dedup import anti_join_seen, first_wins_in_batch
from helix_spark.operators.extract import extract_links
from helix_spark.operators.politeness import (
    STATUS_ROBOTS_DISALLOWED,
    next_host_state,
    robots_gate,
    select_batch,
)
from helix_spark.operators.rank import with_global_rank
from helix_spark.operators.verify import prepare_pages_store, verify_batch
from helix_spark.state.bloom import PartitionedBloom
from helix_spark.state.cuckoo import CuckooFilter
from helix_spark.state.tables import SnapshotWarehouse

RENDERABLE_TYPES = ("Html", "Unknown")

ADMIT_SCHEMA = StructType(
    [
        StructField("raw", StringType()),
        StructField("resolved", StringType()),
        StructField("parent_url", StringType()),
        StructField("parent_host", StringType()),
        StructField("is_extracted", BooleanType()),
        StructField("status_pre", IntegerType()),
        StructField("ctype_pre", StringType()),
        StructField("size_pre", LongType()),
        StructField("is_internal_admit", BooleanType()),
        StructField("parent_priority", LongType()),
        StructField("seq", IntegerType()),
    ]
)

FRONTIER_COLS = [
    "url", "url_hash", "host", "parent_url", "parent_host",
    "is_extracted", "status_pre", "ctype_pre", "size_pre", "is_internal",
    "priority", "wave_admitted",
]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#]*)"


@dataclass
class CrawlOutcome:
    waves: int
    aborted: bool
    total_fetched: int


class CrawlEngine:
    def __init__(self, spark: SparkSession, cfg: CrawlConfig, warehouse_dir: str,
                 pages: DataFrame, page_assets: DataFrame, robots: DataFrame):
        self.spark = spark
        self.cfg = cfg
        self.wh = SnapshotWarehouse(spark, warehouse_dir)
        # localCheckpoint (eager) truncates the logical plan, not just the
        # physical cache — without it Catalyst re-analyzes the 10-hop
        # redirect-resolution union chain on EVERY wave action. Materialize
        # the pages input ONCE first: pages_store and pages_html both derive
        # from it, and a generated `pages` (gen_pages_spark) would otherwise
        # be recomputed per derivation.
        pages = pages.localCheckpoint()
        self.pages_store = prepare_pages_store(pages).localCheckpoint()
        self.pages_html = pages.filter(F.col("html") != "").select(
            canonical_url_col(F.col("url")).alias("final_url"), "html"
        ).localCheckpoint()
        self.assets = page_assets.localCheckpoint()
        self.robots = robots.localCheckpoint()
        self.seed_canon = [
            canonicalize_url_py(s, None, cfg.sort_query)[0] for s in cfg.seeds
        ]
        self.bloom: PartitionedBloom | None = None
        self.cuckoo: CuckooFilter | None = None
        self.counter = 0
        self.aborted = False
        self.verbose = bool(os.environ.get("HELIX_SPARK_VERBOSE"))

    # ----------------------------------------------------------- filter serde
    def _init_filters(self) -> None:
        cfg = self.cfg
        self.bloom = PartitionedBloom.sized_for(cfg.expected_urls, cfg.bloom_fp_rate, cfg.bloom_slices)
        self.cuckoo = CuckooFilter.sized_for(cfg.expected_urls)

    def _save_filters(self, wave: int) -> dict[str, str]:
        bloom_df = self.spark.createDataFrame(
            self.bloom.to_rows(wave),
            "wave int, slice_id int, num_slices int, bits int, hashes int, blob binary",
        )
        cuckoo_df = self.spark.createDataFrame(
            [(wave, self.cuckoo.num_buckets, self.cuckoo.to_bytes())],
            "wave int, num_buckets int, blob binary",
        )
        return {
            "filters_bloom": self.wh.overwrite("filters_bloom", bloom_df),
            "filters_cuckoo": self.wh.overwrite("filters_cuckoo", cuckoo_df),
        }

    def _load_filters(self) -> None:
        bloom_df = self.wh.read("filters_bloom")
        if bloom_df is None:
            self._init_filters()
            return
        rows = [
            (r["wave"], r["slice_id"], r["num_slices"], r["bits"], r["hashes"], bytes(r["blob"]))
            for r in bloom_df.collect()
        ]
        self.bloom = PartitionedBloom.from_rows(rows)
        crow = self.wh.read("filters_cuckoo").collect()[0]
        self.cuckoo = CuckooFilter.from_bytes(crow["num_buckets"], bytes(crow["blob"]))

    # ------------------------------------------------------------- admission
    def _scope_expr(self, canonical, host, parent_host):
        cfg = self.cfg
        checks = canonical.isin(*self.seed_canon) if self.seed_canon else F.lit(False)
        if cfg.remote_host:
            checks = checks | (F.lower(host) == cfg.remote_host.lower())
        return F.coalesce(
            checks | (F.lower(host) == F.lower(parent_host)), F.lit(False)
        )

    def admit(self, items: DataFrame, wave: int):
        """Unified single-pass admission (CoordinatorBlock.PreprocessNewResources,
        /root/reference/Bot/Block/CoordinatorBlock.cs:235-264):

        category 'bad'     malformed −101 / reportable non-http −102 — keyed
                           on the RAW url (lines 240-251), reported, dropped
        category (silent)  non-http with reporting off — dropped, NO seen entry
        category 'blocked' robots-disallowed (−104, north-rule extension)
        category 'ok'      admitted to the frontier

        One first-wins window + ONE bloom-prefiltered anti-join over all
        categories (keys are disjoint: raw vs canonical namespaces).

        → (frontier_rows, report_rows, seen_rows, partition_counts)"""
        cfg = self.cfg
        canonical = canonical_url_col(F.col("resolved"), sort_query=cfg.sort_query)
        status = F.when(F.col("resolved").isNull(), F.lit(STATUS_MALFORMED_URI)).otherwise(
            canonical_status_col(F.col("resolved"))
        )
        enriched = (
            items.withColumn("canonical_url", canonical)
            .withColumn("url_status", status)
            .withColumn(
                "url_status",
                F.when(
                    (F.col("url_status") == 0) & F.col("canonical_url").isNull(),
                    F.lit(STATUS_MALFORMED_URI),
                ).otherwise(F.col("url_status")),
            )
            .withColumn("host", F.regexp_extract(F.col("canonical_url"), _HOST_RE, 1))
            .withColumn("host", F.when(F.col("host") == "", None).otherwise(F.col("host")))
        )
        enriched = enriched.filter(
            ~(
                (F.col("url_status") == STATUS_URI_SCHEME_NOT_SUPPORTED)
                & F.lit(not cfg.include_non_http_urls_in_report)
            )
        )
        is_bad = F.col("url_status") != 0
        enriched = (
            enriched.withColumn(
                "status_pre",
                F.when(
                    (F.col("status_pre") == 0)
                    & F.col("parent_url").isNull()
                    & ~F.col("canonical_url").isin(*self.seed_canon),
                    F.lit(-103),  # orphan (PostProcessorBlock.cs:42-46)
                ).otherwise(F.col("status_pre")),
            )
            .withColumn(
                "is_internal",
                F.coalesce(
                    F.col("is_internal_admit"),
                    self._scope_expr(F.col("canonical_url"), F.col("host"), F.col("parent_host")),
                ),
            )
        )
        enriched = robots_gate(enriched, self.robots)
        enriched = enriched.withColumn(
            "category",
            F.when(is_bad, F.lit("bad"))
            .when(F.col("robots_blocked"), F.lit("blocked"))
            .otherwise(F.lit("ok")),
        ).withColumn(
            "key",
            F.when(is_bad, F.col("raw")).otherwise(F.col("canonical_url")),
        ).withColumn("key_hash", F.xxhash64(F.col("key")))
        # slim before materialization: raw/resolved are folded into `key`;
        # every byte dropped here is saved in the dedup shuffle, the rank
        # shuffle, two checkpoints, and three table writes
        enriched = enriched.select(
            "key", "key_hash", "category", "url_status", "canonical_url",
            "host", "parent_url", "parent_host", "is_extracted", "status_pre",
            "ctype_pre", "size_pre", "is_internal", "parent_priority", "seq",
        )

        # localCheckpoint materializes the (small) admission batch once and
        # truncates its plan — every downstream action (bucket collect,
        # anti-join, rank, three writes) reuses it instead of re-running and
        # re-analyzing the extract UDF + join + canonicalization tree
        t0 = time.time()
        enriched = enriched.localCheckpoint()
        t1 = time.time()
        deduped = first_wins_in_batch(enriched, "key_hash", ["parent_priority", "seq"])
        fresh = anti_join_seen(deduped, self.wh, self.bloom, key="key_hash")
        t2 = time.time()
        fresh, counts = with_global_rank(
            fresh, ["parent_priority", "seq"], rank_col="priority", offset=self.counter
        )
        fresh = fresh.localCheckpoint()
        t3 = time.time()
        if self.verbose:
            print(
                f"[helix-spark]   admit: enrich={t1 - t0:.1f}s dedup+anti={t2 - t1:.1f}s "
                f"rank+ckpt={t3 - t2:.1f}s",
                flush=True,
            )

        bad = fresh.filter(F.col("category") == "bad")
        blocked = fresh.filter(F.col("category") == "blocked")
        ok = fresh.filter(F.col("category") == "ok")

        report_rows = bad.select(
            F.col("key").alias("verified_url"),
            F.col("parent_url"),
            F.when(F.col("url_status") == STATUS_MALFORMED_URI, F.lit(False))
            .otherwise(F.col("is_internal")).alias("is_internal"),
            F.lit("Unknown").alias("resource_type"),
            F.col("url_status").alias("status_code"),
        ).unionByName(
            blocked.select(
                F.col("key").alias("verified_url"),
                F.col("parent_url"),
                F.lit(True).alias("is_internal"),
                F.lit("Unknown").alias("resource_type"),
                F.lit(STATUS_ROBOTS_DISALLOWED).alias("status_code"),
            )
        )
        seen_rows = fresh.select(
            "key_hash",
            "key",
            F.when(F.col("category") == "bad", F.col("url_status"))
            .when(F.col("category") == "blocked", F.lit(STATUS_ROBOTS_DISALLOWED))
            .otherwise(F.lit(None).cast("int")).alias("status_code"),
            F.lit(wave).alias("wave"),
        )
        frontier_rows = ok.select(
            F.col("canonical_url").alias("url"),
            F.col("key_hash").alias("url_hash"),
            "host", "parent_url", "parent_host", "is_extracted",
            "status_pre", "ctype_pre", "size_pre", "is_internal", "priority",
            F.lit(wave).alias("wave_admitted"),
        )
        return frontier_rows, report_rows, seen_rows, counts

    # -------------------------------------------------------------- readers
    def read_seen(self) -> DataFrame | None:
        """Seen map with LSM last-write-wins resolution: latest wave per key;
        within a wave, a settled status beats the queued-null row."""
        raw = self.wh.read("seen")
        if raw is None:
            return None
        w = Window.partitionBy("key_hash").orderBy(
            F.col("wave").desc(),
            F.when(F.col("status_code").isNull(), 1).otherwise(0),
        )
        return (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def read_report(self) -> DataFrame | None:
        """Verification report, one row per verified_url (latest wave wins)."""
        raw = self.wh.read("report")
        if raw is None:
            return None
        w = Window.partitionBy("verified_url").orderBy(F.col("wave").desc())
        return (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "wave")
        )

    # ----------------------------------------------------------- bootstrap
    def bootstrap_frontier(self, urls: DataFrame) -> int:
        """Pre-populate the frontier from a DataFrame of absolute URLs
        (column ``url``) — the resumed-crawl-with-backlog scenario used for
        frontier-throughput benchmarking at 10^x scale. URLs are admitted
        through the full pipeline (canonicalize, robots, dedup, bloom) with
        themselves as parents (internal, non-orphan). Returns admitted count."""
        items = urls.select(
            F.col("url").alias("raw"),
            F.col("url").alias("resolved"),
            F.col("url").alias("parent_url"),
            F.regexp_extract(F.col("url"), _HOST_RE, 1).alias("parent_host"),
            F.lit(True).alias("is_extracted"),
            F.lit(0).alias("status_pre"),
            F.lit(None).cast("string").alias("ctype_pre"),
            F.lit(None).cast("long").alias("size_pre"),
            F.lit(True).alias("is_internal_admit"),
            F.lit(0).cast("long").alias("parent_priority"),
            (F.monotonically_increasing_id() % (2**31 - 1)).cast("int").alias("seq"),
        )
        for f in ADMIT_SCHEMA.fields:
            items = items.withColumn(f.name, F.col(f.name).cast(f.dataType))
        self._init_filters()
        frontier, report, seen, counts = self.admit(items, wave=0)
        self._ingest_filters(seen, None)
        self.counter += sum(counts.values())
        self._commit_wave(-1, frontier, report, seen, None, 0, counts)
        return sum(counts.values())

    # ------------------------------------------------------------- wave body
    def run(self, resume: bool = False) -> CrawlOutcome:
        cfg, wh, spark = self.cfg, self.wh, self.spark
        head = wh.head_commit() if resume else None
        if head:
            start_wave = head["wave"] + 1
            self.counter = head["metrics"].get("counter", 0)
            self._load_filters()
        else:
            self._init_filters()
            seeds = spark.createDataFrame(
                [
                    (s, s, None, None, True, 0, None, None, True, 0, i)
                    for i, s in enumerate(cfg.seeds)
                ],
                ADMIT_SCHEMA,
            )
            frontier, report, seen, counts = self.admit(seeds, wave=0)
            self._ingest_filters(seen, None)
            self.counter += sum(counts.values())
            self._commit_wave(-1, frontier, report, seen, None, 0, counts)
            start_wave = 0

        total_fetched = 0
        wave = start_wave
        while wave < cfg.max_waves:
            t_wave = time.time()
            phase_t: dict[str, float] = {}

            def _mark(name: str, _last=[time.time()]):
                now = time.time()
                phase_t[name] = round(now - _last[0], 1)
                _last[0] = now

            frontier = wh.read("frontier")
            if frontier is None or frontier.isEmpty():
                break
            host_state = wh.read("host_state")
            batch, remainder = select_batch(
                frontier, host_state, wave, cfg.per_host_budget, cfg.salt_partitions
            )
            batch = batch.localCheckpoint()  # truncate window+read lineage
            _mark("select")
            verified = verify_batch(batch, self.pages_store)

            final_host = F.regexp_extract(F.col("final_url"), _HOST_RE, 1)
            recompute = (
                F.col("is_extracted")
                & (F.col("status_pre") == 0)
                & ~F.col("url").isin(*self.seed_canon)
            )
            verified = verified.withColumn(
                "is_internal_final",
                F.when(
                    recompute,
                    self._scope_expr(F.col("final_url"), final_host, F.col("parent_host")),
                ).otherwise(F.col("is_internal")),
            ).localCheckpoint()
            _mark("verify")

            stats = verified.agg(
                F.count("*").alias("n"),
                F.sum(
                    (F.col("redirected") & F.col("url").isin(*self.seed_canon)).cast("int")
                ).alias("seed_redirects"),
            ).collect()[0]
            batch_count = stats["n"]
            if batch_count == 0:
                # logical-clock tick: every queued host is still delayed
                wh.commit(wave, {}, metrics={"counter": self.counter, "batch": 0})
                wave += 1
                continue
            total_fetched += batch_count
            log_rows = batch.select(F.lit(wave).alias("wave"), "priority", "url")

            if stats["seed_redirects"]:
                # redirect at a seed aborts the crawl (CoordinatorBlock.cs:215-226)
                self.aborted = True
                mlog = wh.append("crawl_log", log_rows)
                wh.commit(wave, {"crawl_log": mlog},
                          metrics={"counter": self.counter, "aborted": True})
                return CrawlOutcome(wave + 1, True, total_fetched)

            redirected = verified.filter(F.col("redirected"))
            settled = verified.filter(~F.col("redirected"))
            report_rows = settled.select(
                F.col("final_url").alias("verified_url"),
                F.col("parent_url"),
                F.col("is_internal_final").alias("is_internal"),
                F.col("resource_type"),
                F.col("status_code"),
            )
            seen_updates = settled.select(
                F.col("final_hash").alias("key_hash"),
                F.col("final_url").alias("key"),
                F.col("status_code"),
                F.lit(wave).alias("wave"),
            )

            renderable = settled.filter(
                F.col("is_internal_final")
                & ~is_broken_col(F.col("status_code"))
                & (F.coalesce(F.col("size"), F.lit(0)) <= cfg.max_renderable_size)
                & F.col("resource_type").isin(*RENDERABLE_TYPES)
                & F.col("is_extracted")
                & (F.col("status_pre") == 0)
            )
            admissions = self._collect_admissions(renderable, redirected)
            new_frontier, admit_report, admit_seen, counts = self.admit(admissions, wave + 1)
            _mark("admit")
            self._ingest_filters(admit_seen, seen_updates)
            _mark("filters")
            self.counter += sum(counts.values())

            all_report = report_rows.unionByName(admit_report)
            all_seen = seen_updates.unionByName(admit_seen)
            next_frontier = remainder.select(FRONTIER_COLS).unionByName(
                new_frontier.select(FRONTIER_COLS)
            )
            hs = next_host_state(batch, self.robots, wave, host_state)
            mlog = wh.append("crawl_log", log_rows)
            self._commit_wave(
                wave, next_frontier, all_report, all_seen, hs, batch_count, counts,
                extra_manifests={"crawl_log": mlog},
            )
            _mark("commit")
            if cfg.compact_every and (wave + 1) % cfg.compact_every == 0:
                # periodic LSM compaction; its own atomic commit
                cm = {}
                m1 = wh.compact_bucketed(
                    "seen", version_col="wave", prefer_nonnull="status_code",
                    max_files_per_bucket=cfg.compact_max_files,
                )
                if m1:
                    cm["seen"] = m1
                m2 = wh.compact_bucketed(
                    "report", version_col="wave",
                    max_files_per_bucket=cfg.compact_max_files,
                )
                if m2:
                    cm["report"] = m2
                if cm:
                    wh.commit(wave, cm, metrics={"counter": self.counter, "compaction": True})
            if self.verbose:
                print(
                    f"[helix-spark] wave {wave}: batch={batch_count} "
                    f"admitted={sum(counts.values())} {time.time() - t_wave:.1f}s "
                    f"phases={phase_t}",
                    flush=True,
                )
            wave += 1

        return CrawlOutcome(wave, self.aborted, total_fetched)

    def _ingest_filters(self, admit_seen: DataFrame, seen_updates: DataFrame | None) -> None:
        """bloom: every new seen key. cuckoo: queued keys in, settled keys out
        (the null→status transition, CoordinatorBlock.cs:268-273). In this
        sandbox the cuckoo maintenance collects hashes (small waves); at real
        scale it would be partition-sharded like the bloom."""
        self.bloom.build_update(admit_seen.select("key_hash"), hash_col="key_hash")
        # Arrow toPandas (not collect) — Row materialization of millions of
        # hashes was a serial driver hotspot that flattened scaling
        queued = admit_seen.filter(F.col("status_code").isNull())
        q = queued.select("key_hash").toPandas()["key_hash"].to_numpy(dtype=np.int64)
        if len(q):
            self.cuckoo.insert_hashes(q)
        if seen_updates is not None:
            d = seen_updates.select("key_hash").toPandas()["key_hash"].to_numpy(dtype=np.int64)
            if len(d):
                self.cuckoo.delete_hashes(d)

    # -------------------------------------------------------------- children
    def _collect_admissions(self, renderable: DataFrame, redirected: DataFrame) -> DataFrame:
        cfg = self.cfg
        requeues = redirected.select(
            F.col("final_url").alias("raw"),
            F.col("final_url").alias("resolved"),
            F.col("parent_url"),
            F.col("parent_host"),
            F.col("is_extracted"),
            F.lit(0).alias("status_pre"),
            F.lit(None).cast("string").alias("ctype_pre"),
            F.lit(None).cast("long").alias("size_pre"),
            F.lit(None).cast("boolean").alias("is_internal_admit"),
            F.col("priority").alias("parent_priority"),
            F.lit(0).alias("seq"),
        )

        pages = renderable.select(
            F.col("final_url"), F.col("priority"), F.col("host").alias("page_host")
        )
        assets = pages.join(
            self.assets.withColumnRenamed("page_url", "final_url"), on="final_url", how="inner"
        )
        if not cfg.include_redirect_urls_in_report:
            # sub-resource redirect suppression (HtmlRenderer.cs:86-87)
            assets = assets.filter(
                ~((F.col("status_code") >= 300) & (F.col("status_code") < 400))
            )
        w = Window.partitionBy("final_url").orderBy("seq")
        assets = assets.withColumn("__aseq", F.row_number().over(w) - 1)
        asset_counts = assets.groupBy("final_url").agg(F.count("*").alias("__n_assets"))
        asset_items = assets.select(
            F.col("asset_url").alias("raw"),
            F.col("asset_url").alias("resolved"),
            F.col("final_url").alias("parent_url"),
            F.col("page_host").alias("parent_host"),
            F.lit(False).alias("is_extracted"),
            F.col("status_code").cast("int").alias("status_pre"),
            F.col("content_type").alias("ctype_pre"),
            F.col("size").cast("long").alias("size_pre"),
            F.lit(None).cast("boolean").alias("is_internal_admit"),
            F.col("priority").alias("parent_priority"),
            F.col("__aseq").cast("int").alias("seq"),
        )

        to_render = pages.join(self.pages_html, on="final_url", how="inner")
        links = extract_links(to_render, url_col="final_url", html_col="html")
        links = links.join(asset_counts, on="final_url", how="left").withColumn(
            "__offset", F.coalesce(F.col("__n_assets"), F.lit(0))
        )
        link_items = links.select(
            F.col("href").alias("raw"),
            F.col("resolved_url").alias("resolved"),
            F.col("final_url").alias("parent_url"),
            F.col("page_host").alias("parent_host"),
            F.lit(True).alias("is_extracted"),
            F.lit(0).alias("status_pre"),
            F.lit(None).cast("string").alias("ctype_pre"),
            F.lit(None).cast("long").alias("size_pre"),
            F.lit(None).cast("boolean").alias("is_internal_admit"),
            F.col("priority").alias("parent_priority"),
            (F.col("seq") + F.col("__offset")).cast("int").alias("seq"),
        )
        out = requeues.unionByName(asset_items).unionByName(link_items)
        for f in ADMIT_SCHEMA.fields:
            out = out.withColumn(f.name, F.col(f.name).cast(f.dataType))
        return out.select([f.name for f in ADMIT_SCHEMA.fields])

    # ---------------------------------------------------------------- commit
    def _commit_wave(self, wave, frontier, report, seen, host_state, batch_count,
                     partition_counts=None, extra_manifests: dict | None = None) -> None:
        wh, cfg = self.wh, self.cfg
        manifests = dict(extra_manifests or {})
        manifests["frontier"] = wh.overwrite("frontier", frontier.select(FRONTIER_COLS))
        # seen/report are LSM append-only (O(new rows) per wave, bucket-pruned
        # reads): hash-uniform updates would touch every bucket of a
        # copy-on-write merge, degenerating to an O(table) rewrite per wave.
        # Readers resolve last-write-wins by wave (read_seen / read_report).
        dedup_report = report.dropDuplicates(["verified_url"]).withColumn(
            "wave", F.lit(wave)
        )
        manifests["report"] = wh.append_bucketed(
            "report", dedup_report, key="verified_url", num_buckets=cfg.report_buckets
        )
        dedup_seen = seen.dropDuplicates(["key_hash"])
        manifests["seen"] = wh.append_bucketed(
            "seen", dedup_seen, key="key", num_buckets=cfg.seen_buckets
        )
        if host_state is not None:
            manifests["host_state"] = wh.overwrite("host_state", host_state)
        # per-wave counters (Statistics.cs:6-84 / EventBroadcaster analog):
        # one metrics row per wave, derived from this wave's report rows
        wave_metrics = dedup_report.agg(
            F.lit(wave).alias("wave"),
            F.count("*").alias("report_rows"),
            F.coalesce(
                F.sum((F.abs(F.col("status_code")) >= 400).cast("int")), F.lit(0)
            ).alias("broken_new"),
            F.coalesce(
                F.sum((F.abs(F.col("status_code")) < 400).cast("int")), F.lit(0)
            ).alias("valid_new"),
            F.lit(batch_count).alias("batch"),
        )
        manifests["metrics"] = wh.append("metrics", wave_metrics)
        manifests.update(self._save_filters(wave))
        wh.commit(
            wave,
            manifests,
            metrics={
                "counter": self.counter,
                "batch": batch_count,
                "admit_partition_rows": {str(k): v for k, v in (partition_counts or {}).items()},
            },
        )
