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
