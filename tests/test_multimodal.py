"""Multimodal payload operators + localize kernel + payload invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helix_spark.functions.urls import localize_url_col, localize_url_py
from helix_spark.operators import multimodal
from helix_spark.sources import synthetic


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(synthetic.gen_images_py(12)).localCheckpoint()


def test_decode_stats(spark, images):
    out = multimodal.decode_stats(images).collect()
    assert len(out) == 12
    assert all(r["phash_match"] for r in out)
    assert all(r["dec_w"] in (32, 64) and r["dec_h"] in (32, 64) for r in out)


def test_verify_payloads_invariant(spark, images):
    """input_hint: decoded-pixel allclose (PSNR >= 40 lossy, byte-exact png)
    + caption equality vs reference rows."""
    out = multimodal.verify_payloads(images, images).collect()
    assert len(out) == 12
    assert all(r["pixels_ok"] for r in out)
    assert all(r["caption_ok"] for r in out)
    lossy = [r for r in out if r["psnr_db"] < 99.0]
    assert all(r["psnr_db"] >= 40.0 for r in lossy)


def test_verify_payloads_detects_corruption(spark, images):
    corrupted = images.withColumn(
        "caption", F.concat(F.col("caption"), F.lit(" CORRUPT"))
    )
    out = multimodal.verify_payloads(corrupted, images).collect()
    assert all(not r["caption_ok"] for r in out)


def test_resize(spark, images):
    from helix_spark.sources import codecs

    rows = multimodal.resize_images(images, 8, 8).collect()
    assert len(rows) == 12
    px = codecs.decode_png(bytes(rows[0]["thumb"]))
    assert px.shape == (8, 8, 3)


def test_image_features(spark, images):
    rows = multimodal.image_features(images, grid=4).collect()
    assert len(rows) == 12
    assert all(len(r["feature"].split(",")) == 16 for r in rows)


def test_crawl_payload_invariant_end_to_end(spark, tmp_path):
    """north-star loop closed: crawl the synthetic site, then check the
    input_hint invariant for every Image resource the crawl verified —
    fetched payload vs reference row (pixel/PSNR/caption). A corrupted
    fetch must be caught on exactly the crawled images."""
    from helix_spark.config import CrawlConfig
    from helix_spark.plans.crawl import CrawlEngine

    N, H, N_IMG = 60, 6, 16
    pages = spark.createDataFrame(synthetic.gen_pages_py(N, H))
    assets = spark.createDataFrame(synthetic.gen_assets_py(N, H, n_images=N_IMG))
    robots = spark.createDataFrame(synthetic.gen_robots_py(H))
    imgs = spark.createDataFrame(synthetic.gen_images_py(N_IMG)).localCheckpoint()
    # seed on host1: host0 pages (i%3==0) have zero assets by construction
    # (gen_assets emits i%3 rows), host1 pages carry 1-2 captured images
    cfg = CrawlConfig(
        seeds=["http://host1.test/p/5"], per_host_budget=3, max_waves=60,
        expected_urls=10_000, bloom_slices=4, seen_buckets=8, report_buckets=8,
    )
    eng = CrawlEngine(spark, cfg, str(tmp_path / "wh"), pages, assets, robots)
    eng.run()

    crawled_imgs = {
        r["verified_url"]
        for r in eng.read_report()
        .filter((F.col("resource_type") == "Image") & (F.col("status_code") == 200))
        .collect()
        if "/im/" in r["verified_url"]
    }
    assert crawled_imgs, "the crawl should verify some image assets"

    out = eng.verify_crawled_payloads(imgs, imgs).collect()
    assert len(out) == len(crawled_imgs)
    assert all(r["pixels_ok"] and r["caption_ok"] for r in out)
    assert all(r["psnr_db"] >= 40.0 for r in out)

    corrupted = imgs.withColumn(
        "caption", F.concat(F.col("caption"), F.lit(" CORRUPT"))
    )
    bad = eng.verify_crawled_payloads(corrupted, imgs).collect()
    assert len(bad) == len(crawled_imgs)
    assert all(not r["caption_ok"] for r in bad)

    # a DROPPED payload must fail the invariant, not vanish: removing one
    # crawled image from the fetched set still yields one row per crawled
    # image, with the missing one explicitly pixels_ok=False
    some_id = sorted(
        r["image_id"] for r in eng.verify_crawled_payloads(imgs, imgs).collect()
    )[0]
    dropped = imgs.filter(F.col("image_id") != some_id)
    part = eng.verify_crawled_payloads(dropped, imgs).collect()
    assert len(part) == len(crawled_imgs)
    by_id = {r["image_id"]: r for r in part}
    assert not by_id[some_id]["pixels_ok"] and not by_id[some_id]["caption_ok"]
    assert all(r["pixels_ok"] for i, r in by_id.items() if i != some_id)


# ---- localize (UriLocalizationDescription.cs:11-41 fixture rows) ----
LOCALIZE_CASES = [
    # RemoteHost match → rewrite to start host (lines 30-38)
    ("http://www.helix.com/anything", "www.helix.com", "192.168.1.2", "", "http://192.168.1.2/anything"),
    ("http://WWW.HELIX.COM/x?q=1", "www.helix.com", "192.168.1.2", "", "http://192.168.1.2/x?q=1"),
    # pass-through when host differs (lines 20-28)
    ("http://other.com/path", "www.helix.com", "192.168.1.2", "", "http://other.com/path"),
    # port on target
    ("https://www.helix.com/s", "www.helix.com", "local.test", "8443", "https://local.test:8443/s"),
]


@pytest.mark.parametrize("url,remote,host,port,expected", LOCALIZE_CASES)
def test_localize_py(url, remote, host, port, expected):
    assert localize_url_py(url, remote, host, port) == expected


def test_localize_col(spark):
    df = spark.createDataFrame([(c[0],) for c in LOCALIZE_CASES], ["url"])
    outs = [
        df.filter(F.col("url") == c[0])
        .select(localize_url_col(F.col("url"), c[1], c[2], c[3]).alias("out"))
        .collect()[0]["out"]
        for c in LOCALIZE_CASES
    ]
    assert outs == [c[4] for c in LOCALIZE_CASES]
