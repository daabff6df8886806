"""Codecs + synthetic-universe generators (python twin vs spark twin)."""

from __future__ import annotations

import numpy as np

from helix_spark.sources import codecs, synthetic


def test_png_roundtrip_byte_exact():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (48, 32, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)


def test_lossy_psnr_above_40():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    dec = codecs.decode_lossy(codecs.encode_lossy(px))
    assert codecs.psnr(px, dec) >= 40.0


def test_phash_stability_and_locality():
    px, _, _ = synthetic._image_pixels(5)
    h1 = codecs.phash64(px)
    assert h1 == codecs.phash64(px.copy())
    # lossy round-trip keeps the perceptual hash close (hamming < 8)
    dec = codecs.decode_lossy(codecs.encode_lossy(px))
    h2 = codecs.phash64(dec)
    assert bin(np.uint64(h1 ^ h2).item() & (2**64 - 1)).count("1") < 8


def test_image_rows_deterministic():
    a = synthetic.gen_image_row(9)
    b = synthetic.gen_image_row(9)
    assert a["bytes"] == b["bytes"] and a["phash"] == b["phash"]
    assert a["caption"] == b["caption"]


def test_pages_py_vs_spark_identical(spark):
    N, H = 120, 8
    py = synthetic.gen_pages_py(N, H).sort_values("url").reset_index(drop=True)
    sp = (
        synthetic.gen_pages_spark(spark, N, H)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(py) == len(sp) == N
    for col in ["url", "html", "status_code", "content_type", "size"]:
        assert (py[col].astype(str) == sp[col].astype(str)).all(), f"mismatch in {col}"
    assert (py["redirect_to"].fillna("∅") == sp["redirect_to"].fillna("∅")).all()


def test_images_spark_matches_py(spark):
    sp = synthetic.gen_images_spark(spark, 12).toPandas().sort_values("image_id")
    py = synthetic.gen_images_py(12).sort_values("image_id")
    assert list(sp["phash"]) == list(py["phash"])
    assert [bytes(b) for b in sp["bytes"]] == [bytes(b) for b in py["bytes"]]


def test_image_payload_invariants():
    """input_hint invariant: png byte-exact decode, lossy PSNR >= 40, caption
    byte-equality across regenerations."""
    for k in range(8):
        row = synthetic.gen_image_row(k)
        px = codecs.decode_image(bytes(row["bytes"]), row["fmt"])
        orig, w, h = synthetic._image_pixels(k)
        assert px.shape == (h, w, 3)
        if row["fmt"] == "png":
            assert np.array_equal(px, orig)
        else:
            assert codecs.psnr(orig, px) >= 40.0
