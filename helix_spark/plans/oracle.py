"""Serial reference-semantics crawler — the executable parity spec.

A ~200-line pure-Python crawler implementing the coordinator/verifier/
renderer semantics of the reference exactly (SURVEY.md §2.3):

- first-wins seen-set TryAdd, serialized in admission order
  (CoordinatorBlock.cs:235-264; key = fragment-stripped canonical URL,
  raw OriginalUrl for malformed/non-http rows, lines 240-256)
- BFS waves with per-page document order (captured assets first, then
  extracted anchors — PostProcessorBlock.cs:26-28)
- redirect re-queue of the FINAL url once if unseen; the original URL gets
  no report row and stays status-null in the seen set
  (CoordinatorBlock.cs:201-214); redirect at a seed aborts (215-226)
- verify-only-extracted, external verified-not-expanded
  (ResourceVerifierBlock.cs:54-77)
- render gates: not broken ∧ internal ∧ extracted ∧ type∈{Html,Unknown} ∧
  size ≤ cap (HtmlRendererBlock.cs:57-91)
- report upsert: one row per verified_url, last write wins
  (ReportWriterBlock.cs:126, CoordinatorBlock.cs:188)
- north-rule extensions mirrored identically in the engine: per-host
  politeness budget + crawl-delay logical clock, robots prefix gate
  (status −104), query-param sorting

The Spark engine (plans/crawl.py) must reproduce: the seen map exactly,
the report exactly, and the fetch order exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from helix_spark.config import CrawlConfig
from helix_spark.functions.status import is_broken_py, resource_type_py
from helix_spark.functions.urls import (
    STATUS_MALFORMED_URI,
    STATUS_URI_SCHEME_NOT_SUPPORTED,
    canonicalize_url_py,
    url_host_py,
)
from helix_spark.operators.extract import extract_hrefs_py
from helix_spark.operators.politeness import STATUS_ROBOTS_DISALLOWED

RENDERABLE_TYPES = ("Html", "Unknown")


@dataclass
class OracleResult:
    seen: dict[str, int | None] = field(default_factory=dict)
    report: dict[str, dict] = field(default_factory=dict)
    crawl_order: list[tuple[int, str]] = field(default_factory=list)
    waves: int = 0
    aborted: bool = False
    # per-wave avg page-load time over settled fetches
    # (StatisticsSnapshot.cs:7 parity; None when nothing settled with a load)
    wave_avg_load_ms: dict[int, float | None] = field(default_factory=dict)


class SerialOracle:
    def __init__(self, cfg: CrawlConfig, pages: pd.DataFrame, assets: pd.DataFrame,
                 robots: pd.DataFrame):
        self.cfg = cfg
        self.pages = {
            r["url"]: r for r in pages.to_dict("records")
        }  # store urls are canonical by construction
        self.assets: dict[str, list[dict]] = {}
        for r in assets.to_dict("records"):
            self.assets.setdefault(r["page_url"], []).append(r)
        for v in self.assets.values():
            v.sort(key=lambda a: a["seq"])
        self.robots = {r["host"]: r for r in robots.to_dict("records")}
        self.seed_canon = {
            canonicalize_url_py(s, None, cfg.sort_query)[0] for s in cfg.seeds
        }

    # ------------------------------------------------------------------ run
    def run(self) -> OracleResult:
        cfg = self.cfg
        res = OracleResult()
        seen = res.seen
        frontier: list[dict] = []
        host_next: dict[str, int] = {}
        counter = 0

        def report_upsert(verified_url, parent_url, is_internal, rtype, status):
            res.report[verified_url] = {
                "verified_url": verified_url,
                "parent_url": parent_url,
                "is_internal": bool(is_internal),
                "resource_type": rtype,
                "status_code": int(status),
            }
            seen[verified_url] = int(status)

        def scope_internal(canonical, host, parent_host):
            if canonical in self.seed_canon:
                return True
            if cfg.remote_host and host and host.lower() == cfg.remote_host.lower():
                return True
            return bool(host and parent_host and host.lower() == parent_host.lower())

        def admit(items, wave):
            """items in admission order; mutates seen/frontier/counter."""
            nonlocal counter
            for it in items:
                raw = it["raw"]
                canonical, status = canonicalize_url_py(
                    raw if it["resolved"] is None else it["resolved"],
                    None,
                    cfg.sort_query,
                )
                if it["resolved"] is None and canonical is None:
                    status = STATUS_MALFORMED_URI
                if status == STATUS_MALFORMED_URI or (
                    status == STATUS_URI_SCHEME_NOT_SUPPORTED
                    and cfg.include_non_http_urls_in_report
                ):
                    key = raw
                    if key in seen:
                        continue
                    seen[key] = None
                    host = url_host_py(canonical)
                    is_int = (
                        False
                        if status == STATUS_MALFORMED_URI
                        else scope_internal(canonical, host, it["parent_host"])
                    )
                    report_upsert(key, it["parent"], is_int, "Unknown", status)
                    continue
                if status == STATUS_URI_SCHEME_NOT_SUPPORTED:
                    continue  # dropped silently (CoordinatorBlock.cs:256)
                host = url_host_py(canonical)
                status_pre = it["status_pre"]
                if status_pre == 0 and it["parent"] is None and canonical not in self.seed_canon:
                    status_pre = -103  # orphan (PostProcessorBlock.cs:42-46)
                rb = self.robots.get(host)
                if rb:
                    path = canonical.split(host, 1)[1] if host in canonical else "/"
                    if any(path.startswith(p) for p in rb["disallow_prefixes"]):
                        if canonical in seen:
                            continue
                        seen[canonical] = None
                        report_upsert(
                            canonical, it["parent"], True, "Unknown", STATUS_ROBOTS_DISALLOWED
                        )
                        continue
                if canonical in seen:
                    continue
                seen[canonical] = None
                frontier.append(
                    {
                        **it,
                        "url": canonical,
                        "host": host,
                        "status_pre": status_pre,
                        "is_internal": it["is_internal"]
                        if it["is_internal"] is not None
                        else scope_internal(canonical, host, it["parent_host"]),
                        "priority": counter,
                        "wave_admitted": wave,
                    }
                )
                counter += 1

        # ------------------------------------------------------------- seeds
        admit(
            [
                {
                    "raw": s,
                    "resolved": s,
                    "parent": None,
                    "parent_host": None,
                    "is_extracted": True,
                    "status_pre": 0,
                    "ctype_pre": None,
                    "size_pre": None,
                    "is_internal": True,
                    "seq": i,
                }
                for i, s in enumerate(cfg.seeds)
            ],
            wave=0,
        )

        wave = 0
        while frontier and wave < cfg.max_waves:
            eligible = [
                f for f in frontier if host_next.get(f["host"], 0) <= wave
            ]
            by_host: dict[str, list[dict]] = {}
            for f in sorted(eligible, key=lambda x: x["priority"]):
                by_host.setdefault(f["host"], []).append(f)
            batch = []
            for h, items in by_host.items():
                batch.extend(items[: cfg.per_host_budget])
            if not batch:
                wave += 1
                if wave >= cfg.max_waves:
                    break
                continue
            batch.sort(key=lambda x: x["priority"])
            batch_ids = {id(b) for b in batch}
            frontier = [f for f in frontier if id(f) not in batch_ids]
            for h in {b["host"] for b in batch}:
                delay = self.robots.get(h, {}).get("crawl_delay_waves", 0)
                host_next[h] = wave + 1 + delay

            # phase A: fetch the whole batch (pure), then abort-check, then route
            fetched = []
            for item in batch:
                res.crawl_order.append((wave, item["url"]))
                fetched.append((item, self._fetch(item)))
                final = fetched[-1][1][0]
                if final != item["url"] and item["url"] in self.seed_canon:
                    res.aborted = True  # redirect at seed (CoordinatorBlock.cs:215-226)
                    res.waves = wave + 1
                    return res

            loads = [
                load
                for item, (final, _s, _c, _z, load) in fetched
                if final == item["url"] and load is not None
            ]
            res.wave_avg_load_ms[wave] = (sum(loads) / len(loads)) if loads else None

            admissions = []
            for item, (final, status, ctype, size, _load) in fetched:
                rtype = resource_type_py(ctype)
                is_internal = item["is_internal"]
                if item["is_extracted"] and item["status_pre"] == 0 and item["url"] not in self.seed_canon:
                    is_internal = scope_internal(final, url_host_py(final), item["parent_host"])
                if final != item["url"]:  # redirect happened
                    admissions.append(
                        {
                            "raw": final,
                            "resolved": final,
                            "parent": item["parent"],
                            "parent_host": item["parent_host"],
                            "is_extracted": item["is_extracted"],
                            "status_pre": 0,
                            "ctype_pre": None,
                            "size_pre": None,
                            "is_internal": None,
                            "parent_priority": item["priority"],
                            "seq": 0,
                        }
                    )
                    continue  # no report row for the original URL
                if not is_internal:
                    report_upsert(final, item["parent"], False, rtype, status)
                    continue
                renderable = (
                    not is_broken_py(status)
                    and (size is None or size <= cfg.max_renderable_size)
                    and rtype in RENDERABLE_TYPES
                    and item["is_extracted"]
                    and item["status_pre"] == 0
                )
                report_upsert(final, item["parent"], is_internal, rtype, status)
                if not renderable:
                    continue
                page = self.pages.get(final)
                if page is None:
                    continue
                children = []
                seq = 0
                for a in self.assets.get(final, []):
                    if (
                        300 <= a["status_code"] < 400
                        and not cfg.include_redirect_urls_in_report
                    ):
                        continue  # HtmlRenderer.cs:86-87
                    children.append(
                        {
                            "raw": a["asset_url"],
                            "resolved": a["asset_url"],
                            "parent": final,
                            "parent_host": url_host_py(final),
                            "is_extracted": False,
                            "status_pre": a["status_code"],
                            "ctype_pre": a["content_type"],
                            "size_pre": a["size"],
                            "is_internal": None,
                            "parent_priority": item["priority"],
                            "seq": seq,
                        }
                    )
                    seq += 1
                for href in extract_hrefs_py(page["html"]):
                    from helix_spark.functions.urls import resolve_url_py

                    children.append(
                        {
                            "raw": href,
                            "resolved": resolve_url_py(href, final),
                            "parent": final,
                            "parent_host": url_host_py(final),
                            "is_extracted": True,
                            "status_pre": 0,
                            "ctype_pre": None,
                            "size_pre": None,
                            "is_internal": None,
                            "parent_priority": item["priority"],
                            "seq": seq,
                        }
                    )
                    seq += 1
                admissions.extend(children)

            admissions.sort(key=lambda x: (x["parent_priority"], x["seq"]))
            admit(admissions, wave + 1)
            wave += 1

        res.waves = wave
        return res

    # ----------------------------------------------------------------- fetch
    def _fetch(self, item) -> tuple[str, int, str | None, int | None, int | None]:
        """(final_url, status, content_type, size, load_ms) with bounded
        redirect following — the ResourceVerifier.Verify twin."""
        if not (item["is_extracted"] and item["status_pre"] == 0):
            return item["url"], item["status_pre"], item["ctype_pre"], item["size_pre"], None
        url = item["url"]
        for _ in range(11):
            page = self.pages.get(url)
            if page is None:
                return url, -400, None, None, None
            status = int(page["status_code"])
            if 300 <= status < 400:
                nxt = page.get("redirect_to")
                if not nxt or not isinstance(nxt, str):
                    return url, -400, None, None, None
                url = canonicalize_url_py(nxt, None, self.cfg.sort_query)[0]
                continue
            load = page.get("load_ms")
            return url, status, page["content_type"], int(page["size"]), (
                int(load) if load is not None else None
            )
        return url, -400, None, None, None  # hop limit (HttpRedirectException analog)
