"""Checkpoint/resume: a crawl killed after wave k resumes from the HEAD
snapshot and converges to the identical final state with no re-fetch
(north rule; SURVEY.md §5 item 5)."""

from __future__ import annotations

import pytest

from helix_spark.config import CrawlConfig
from helix_spark.plans.crawl import CrawlEngine
from helix_spark.plans.oracle import SerialOracle
from helix_spark.sources import synthetic


def _cfg(max_waves):
    return CrawlConfig(
        seeds=["http://host0.test/p/0"],
        per_host_budget=3,
        max_waves=max_waves,
        expected_urls=10_000,
        bloom_slices=4,
        seen_buckets=8,
        report_buckets=8,
    )


@pytest.fixture(scope="module")
def universe(spark):
    N, H = 60, 6
    return (
        synthetic.gen_pages_py(N, H),
        synthetic.gen_assets_py(N, H, 16),
        synthetic.gen_robots_py(H),
    )


def _tables(spark, universe):
    pages_pd, assets_pd, robots_pd = universe
    return (
        spark.createDataFrame(pages_pd),
        spark.createDataFrame(assets_pd),
        spark.createDataFrame(robots_pd),
    )


def test_kill_and_resume_matches_uninterrupted(spark, universe, tmp_path):
    pages, assets, robots = _tables(spark, universe)

    # uninterrupted run
    full = CrawlEngine(spark, _cfg(40), str(tmp_path / "full"), pages, assets, robots)
    full.run()
    want_seen = {r["key"]: r["status_code"] for r in full.read_seen().collect()}
    want_order = [
        (r["wave"], r["url"])
        for r in full.wh.read("crawl_log").orderBy("wave", "priority").collect()
    ]

    # killed after 3 waves (max_waves acts as the kill switch: the engine
    # stops between atomic commits, exactly like a SIGKILL between waves)
    part = CrawlEngine(spark, _cfg(3), str(tmp_path / "part"), pages, assets, robots)
    out1 = part.run()
    assert out1.waves == 3

    # resume with a FRESH engine object on the same warehouse
    resumed = CrawlEngine(spark, _cfg(40), str(tmp_path / "part"), pages, assets, robots)
    out2 = resumed.run(resume=True)

    got_seen = {r["key"]: r["status_code"] for r in resumed.read_seen().collect()}
    got_order = [
        (r["wave"], r["url"])
        for r in resumed.wh.read("crawl_log").orderBy("wave", "priority").collect()
    ]
    assert got_seen == want_seen
    assert got_order == want_order
    # no re-fetch: each url fetched exactly once across kill+resume
    urls = [u for _, u in got_order]
    assert len(urls) == len(set(urls))
    assert out1.total_fetched + out2.total_fetched == len(want_order)


def test_remote_host_scope_parity(spark, universe, tmp_path):
    """remote_host makes a second host internal (ResourceScope.cs:17);
    engine and oracle must agree on the expanded crawl."""
    pages_pd, assets_pd, robots_pd = universe
    pages, assets, robots = _tables(spark, universe)
    cfg = _cfg(40)
    cfg.remote_host = "host2.test"
    oracle = SerialOracle(cfg, pages_pd, assets_pd, robots_pd).run()
    eng = CrawlEngine(spark, cfg, str(tmp_path / "rh"), pages, assets, robots)
    eng.run()
    got_seen = {r["key"]: r["status_code"] for r in eng.read_seen().collect()}
    assert got_seen == oracle.seen
    got_rep = {
        r["verified_url"]: (r["parent_url"], r["is_internal"], r["resource_type"], r["status_code"])
        for r in eng.read_report().collect()
    }
    want_rep = {
        k: (v["parent_url"], v["is_internal"], v["resource_type"], v["status_code"])
        for k, v in oracle.report.items()
    }
    assert got_rep == want_rep
