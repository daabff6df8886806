"""Fetch/verify stage — the reference's 300-way HTTP verifier as a
vectorized lookup-join against the content store.

Parity contract (/root/reference/Bot/Business/ResourceVerifier.cs:22-91):
- only resources extracted from HTML (and not already status-tagged) are
  verified (ResourceVerifierBlock.cs:62, Verify early-return line 26)
- redirects (3xx) are followed hop by hop to a final URL (lines 54-72);
  missing target / no Location / >10 hops → Failed −400 (lines 76-81)
- final status / content-type / size land on the resource; resource type
  via the ordered prefix map (line 47)

Scale design: the store is STATIC per crawl, so redirect chains are resolved
transitively ONCE at store-prep time (bounded iterative join over the
redirecting minority only — ~single-digit % of pages), then every wave's
verify is ONE equi-join on url_hash. This removes a 10-iteration join loop
from the per-wave hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from helix_spark.functions.status import resource_type_col
from helix_spark.functions.urls import (
    STATUS_FAILED,
    url_hash_col,
    with_canonical_url_2step,
)

MAX_REDIRECT_HOPS = 10


def _is_redirect(status):
    return (status >= 300) & (status < 400)


def prepare_pages_store(pages: DataFrame, sort_query: bool = True) -> DataFrame:
    """pages(url, status_code, content_type, size, redirect_to) → verify
    store keyed by url_hash with redirect chains pre-resolved:
    (url_hash, final_url, final_status, final_ctype, final_size).

    ``sort_query`` must match CrawlConfig.sort_query: frontier url_hash keys
    are computed under the config's canonicalization, so a store keyed under
    a different one would miss every multi-param-query URL.

    The iterative resolution runs once, joins only the still-redirecting
    subset each hop, and the result is persisted by the caller.

    Canonicalization runs in the MULTI-PROJECTION form (with_canonical_
    url_2step — bit-identical to the one-step Column, pinned by
    tests/test_urls.py): the one-step tree re-evaluates its inlined shared
    subexpressions per reference AND per internal occurrence (interpreted —
    the array_sort lambda blocks codegen), and this store prep referenced
    it three times per page row (url hash, url, redirect_to). One-time
    engine-init cost, but it is O(corpus) work."""
    load = (
        F.col("load_ms").cast("long")
        if "load_ms" in pages.columns
        else F.lit(None).cast("long")
    )
    src = with_canonical_url_2step(
        pages, F.col("url"), out="__canon", sort_query=sort_query
    )
    src = with_canonical_url_2step(
        src, F.col("redirect_to"), out="__canon_next", sort_query=sort_query
    )
    base = src.select(
        url_hash_col(F.col("__canon")).alias("url_hash"),
        F.col("__canon").alias("p_url"),
        F.col("status_code").cast("int").alias("p_status"),
        F.col("content_type").alias("p_ctype"),
        F.col("size").cast("long").alias("p_size"),
        F.col("__canon_next").alias("p_next"),
        load.alias("p_load"),
    ).persist()

    redir = _is_redirect(F.col("p_status"))
    done = base.filter(~redir | F.col("p_next").isNull()).select(
        "url_hash",
        F.when(redir & F.col("p_next").isNull(), F.lit(STATUS_FAILED))
        .otherwise(F.col("p_status")).alias("final_status"),
        F.col("p_url").alias("final_url"),
        F.col("p_ctype").alias("final_ctype"),
        F.col("p_size").alias("final_size"),
        F.col("p_load").alias("final_load_ms"),
    )
    pending = base.filter(redir & F.col("p_next").isNotNull()).select(
        "url_hash", F.col("p_next").alias("cur_url")
    )
    lookup = base.select(
        url_hash_col(F.col("p_url")).alias("__cur_hash"),
        F.col("p_status").alias("c_status"),
        F.col("p_ctype").alias("c_ctype"),
        F.col("p_size").alias("c_size"),
        F.col("p_next").alias("c_next"),
        F.col("p_load").alias("c_load"),
    )
    for _hop in range(MAX_REDIRECT_HOPS):
        # localCheckpoint per hop: the pending set shrinks geometrically but
        # its lineage would otherwise GROW per hop — each isEmpty() would
        # recompute every previous hop's join (O(hops²) work).
        pending = pending.localCheckpoint()
        if pending.isEmpty():
            break
        j = pending.withColumn("__cur_hash", url_hash_col(F.col("cur_url"))).join(
            lookup, on="__cur_hash", how="left"
        )
        # missing target → −400 at the target URL (network-error analog);
        # 3xx without target → −400; non-3xx → settled
        settled = j.filter(
            F.col("c_status").isNull()
            | ~_is_redirect(F.col("c_status"))
            | F.col("c_next").isNull()
        ).select(
            "url_hash",
            F.when(
                F.col("c_status").isNull()
                | (_is_redirect(F.col("c_status")) & F.col("c_next").isNull()),
                F.lit(STATUS_FAILED),
            ).otherwise(F.col("c_status")).alias("final_status"),
            F.col("cur_url").alias("final_url"),
            F.when(F.col("c_status").isNull() | _is_redirect(F.col("c_status")), F.lit(None))
            .otherwise(F.col("c_ctype")).alias("final_ctype"),
            F.when(F.col("c_status").isNull() | _is_redirect(F.col("c_status")), F.lit(None))
            .otherwise(F.col("c_size")).cast("long").alias("final_size"),
            F.when(F.col("c_status").isNull() | _is_redirect(F.col("c_status")), F.lit(None))
            .otherwise(F.col("c_load")).cast("long").alias("final_load_ms"),
        )
        done = done.unionByName(settled)
        pending = j.filter(
            F.col("c_status").isNotNull()
            & _is_redirect(F.col("c_status"))
            & F.col("c_next").isNotNull()
        ).select("url_hash", F.col("c_next").alias("cur_url"))
    # hop-limit leftovers → Failed at the last URL reached
    leftovers = pending.select(
        "url_hash",
        F.lit(STATUS_FAILED).alias("final_status"),
        F.col("cur_url").alias("final_url"),
        F.lit(None).cast("string").alias("final_ctype"),
        F.lit(None).cast("long").alias("final_size"),
        F.lit(None).cast("long").alias("final_load_ms"),
    )
    store = done.unionByName(leftovers)
    base.unpersist()
    return store


def verify_batch(batch: DataFrame, pages_store: DataFrame) -> DataFrame:
    """ONE equi-join per wave. Rows with status_pre != 0 (captured assets,
    −103 orphans) or not extracted skip verification entirely."""
    needs_verify = F.col("is_extracted") & (F.col("status_pre") == 0)
    joined = batch.join(pages_store, on="url_hash", how="left")
    out = joined.select(
        *batch.columns,
        F.when(~needs_verify, F.col("url"))
        .otherwise(F.coalesce(F.col("final_url"), F.col("url"))).alias("final_url2"),
        F.when(~needs_verify, F.col("status_pre"))
        .otherwise(F.coalesce(F.col("final_status"), F.lit(STATUS_FAILED))).alias("status_code"),
        F.when(~needs_verify, F.col("ctype_pre")).otherwise(F.col("final_ctype")).alias("content_type"),
        F.when(~needs_verify, F.col("size_pre")).otherwise(F.col("final_size")).alias("size"),
        F.when(~needs_verify, F.lit(None).cast("long"))
        .otherwise(F.col("final_load_ms")).alias("load_ms"),
    ).withColumnRenamed("final_url2", "final_url")
    return (
        out.withColumn("final_hash", url_hash_col(F.col("final_url")))
        .withColumn("redirected", F.col("final_url") != F.col("url"))
        .withColumn("resource_type", resource_type_col(F.col("content_type")))
    )
