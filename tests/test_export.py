"""Report export round-trip (the reference's user artifact — README.md:36-38
'Support SQLite and CSV outputs', ReportWriterBlock.cs:111-128)."""

from __future__ import annotations

import csv
import sqlite3

import pytest

from helix_spark.config import CrawlConfig
from helix_spark.plans.crawl import CrawlEngine
from helix_spark.sources import synthetic


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    N, H = 45, 5
    pages = spark.createDataFrame(synthetic.gen_pages_py(N, H))
    assets = spark.createDataFrame(synthetic.gen_assets_py(N, H, 16))
    robots = spark.createDataFrame(synthetic.gen_robots_py(H))
    cfg = CrawlConfig(
        seeds=["http://host0.test/p/0"], per_host_budget=3, max_waves=40,
        expected_urls=5000, bloom_slices=4, seen_buckets=8, report_buckets=8,
    )
    eng = CrawlEngine(
        spark, cfg, str(tmp_path_factory.mktemp("export") / "wh"), pages, assets, robots
    )
    eng.run()
    return eng


def _expected(engine) -> dict:
    return {
        r["verified_url"]: (
            r["parent_url"], bool(r["is_internal"]), r["resource_type"], r["status_code"]
        )
        for r in engine.read_report().collect()
    }


def test_csv_roundtrip(engine, tmp_path):
    path = str(tmp_path / "report.csv")
    n = engine.export_report(path, fmt="csv")
    want = _expected(engine)
    assert n == len(want) > 0
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == n
    got = {
        r["VerifiedUrl"]: (
            r["ParentUrl"] or None,
            r["IsInternalResource"] == "True",
            r["ResourceType"],
            int(r["StatusCode"]),
        )
        for r in rows
    }
    assert got == want


def test_sqlite_roundtrip(engine, tmp_path):
    path = str(tmp_path / "report.sqlite")
    n = engine.export_report(path, fmt="sqlite")
    want = _expected(engine)
    assert n == len(want)
    con = sqlite3.connect(path)
    try:
        # the reference's table/column names, unique VerifiedUrl index
        rows = con.execute(
            "SELECT VerifiedUrl, ParentUrl, IsInternalResource, ResourceType, StatusCode"
            " FROM VerificationResults"
        ).fetchall()
        idx = con.execute(
            "SELECT COUNT(*) FROM sqlite_master WHERE type='index'"
            " AND name='IX_VerificationResults_VerifiedUrl'"
        ).fetchone()[0]
    finally:
        con.close()
    assert idx == 1
    got = {v: (p, bool(i), rt, sc) for v, p, i, rt, sc in rows}
    assert got == want


def test_csv_dir_distributed(engine, tmp_path, spark):
    path = str(tmp_path / "report_dir")
    engine.export_report(path, fmt="csv-dir")
    back = spark.read.option("header", True).csv(path)
    assert back.count() == len(_expected(engine))
    assert "VerifiedUrl" in back.columns
