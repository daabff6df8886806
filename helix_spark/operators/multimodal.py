"""Multimodal payload operators over the `images` table
(image_id, bytes:binary, w, h, fmt, caption, phash — BASELINE.json input_hint).

Binary payloads are opaque to Catalyst, so each operator is a mapInPandas
over Arrow batches: the Spark-side plumbing (schema, batch shape, column
pruning — the verify stage never reads `bytes` unless asked) is real and
tested. Decode uses the repo's pure-stdlib PNG codec and the clearly-marked
deterministic fake lossy codec (sources/codecs.py) because this container
ships no image libraries; a real PIL/libjpeg decode drops into
``_decode_one`` without touching any Spark plumbing.

Parity role: ``verify_payloads`` implements the input_hint's per-row
invariant — decoded-pixel byte-equality for PNG, PSNR ≥ 40 dB for lossy
formats, caption byte-equality — against reference rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from helix_spark.sources import codecs


def _decode_one(data: bytes, fmt: str) -> np.ndarray:
    # swap-in point for a real codec (PIL / libjpeg) when available
    return codecs.decode_image(data, fmt)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode each payload → (image_id, dec_w, dec_h, mean_luma_milli,
    phash_check). Demonstrates the decode path + phash recomputation."""
    schema = StructType([
        StructField("image_id", StringType()),
        StructField("dec_w", IntegerType()),
        StructField("dec_h", IntegerType()),
        StructField("mean_luma_milli", LongType()),
        StructField("phash_match", BooleanType()),
    ])

    luma_w = np.array([0.299, 0.587, 0.114])

    def run(batches):
        for pdf in batches:
            # decode is inherently per-image (variable shapes); iterate via
            # zip over column arrays — no pandas row materialization
            pixels = [
                _decode_one(bytes(b), f)
                for b, f in zip(pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy())
            ]
            out = pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "dec_w": np.array([p.shape[1] for p in pixels], dtype=np.int32),
                    "dec_h": np.array([p.shape[0] for p in pixels], dtype=np.int32),
                    "mean_luma_milli": np.array(
                        [int(float(np.mean(p @ luma_w)) * 1000) for p in pixels],
                        dtype=np.int64,
                    ),
                    "phash_match": np.fromiter(
                        (codecs.phash64(p) for p in pixels), dtype=np.int64, count=len(pixels)
                    ) == pdf["phash"].to_numpy(dtype=np.int64),
                }
            )
            yield out

    return images.select("image_id", "bytes", "fmt", "phash").mapInPandas(run, schema)


def verify_payloads(images: DataFrame, reference: DataFrame) -> DataFrame:
    """input_hint invariant vs reference rows: PNG decoded pixels byte-equal,
    lossy PSNR ≥ 40 dB, captions byte-equal. Join on image_id, decode both
    sides per Arrow batch → (image_id, pixels_ok, psnr_db, caption_ok)."""
    ref = reference.select(
        F.col("image_id"),
        F.col("bytes").alias("ref_bytes"),
        F.col("fmt").alias("ref_fmt"),
        F.col("caption").alias("ref_caption"),
    )
    joined = images.select("image_id", "bytes", "fmt", "caption").join(ref, on="image_id")
    schema = StructType([
        StructField("image_id", StringType()),
        StructField("pixels_ok", BooleanType()),
        StructField("psnr_db", DoubleType()),
        StructField("caption_ok", BooleanType()),
    ])

    def run(batches):
        for pdf in batches:
            oks, psnrs = [], []
            for data, fmt, rdata, rfmt in zip(
                pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy(),
                pdf["ref_bytes"].to_numpy(), pdf["ref_fmt"].to_numpy(),
            ):
                px = _decode_one(bytes(data), fmt)
                ref_px = _decode_one(bytes(rdata), rfmt)
                if fmt == "png" and rfmt == "png":
                    ok = bool(np.array_equal(px, ref_px))
                    p = float("inf") if ok else codecs.psnr(px, ref_px)
                else:
                    p = codecs.psnr(ref_px, px)
                    ok = p >= 40.0
                oks.append(ok)
                psnrs.append(min(p, 99.0))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "pixels_ok": np.array(oks, dtype=bool),
                    "psnr_db": np.array(psnrs, dtype=np.float64),
                    "caption_ok": (
                        pdf["caption"].to_numpy() == pdf["ref_caption"].to_numpy()
                    ),
                }
            )

    return joined.mapInPandas(run, schema)


def resize_images(images: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Nearest-neighbor resize → re-encoded PNG thumbnails
    (image_id, thumb:binary, thumb_w, thumb_h)."""
    schema = StructType([
        StructField("image_id", StringType()),
        StructField("thumb", BinaryType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
    ])

    def run(batches):
        for pdf in batches:
            thumbs = []
            for data, fmt in zip(pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()):
                px = _decode_one(bytes(data), fmt)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                thumbs.append(codecs.encode_png(px[yi][:, xi].astype(np.uint8)))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "thumb": thumbs,
                    "thumb_w": np.full(len(thumbs), out_w, dtype=np.int32),
                    "thumb_h": np.full(len(thumbs), out_h, dtype=np.int32),
                }
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema)


def image_features(images: DataFrame, grid: int = 4) -> DataFrame:
    """Block-mean luma feature vector (grid×grid floats) per image — the
    embedding-extraction stand-in; output feeds operators/similarity.py."""
    schema = StructType([
        StructField("image_id", StringType()),
        StructField("feature", StringType()),  # csv for portability
        StructField("phash", LongType()),
    ])

    luma_w = np.array([0.299, 0.587, 0.114])

    def run(batches):
        for pdf in batches:
            feats, phashes = [], []
            for data, fmt in zip(pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()):
                px = _decode_one(bytes(data), fmt)
                luma = px.astype(np.float64) @ luma_w
                h, w = luma.shape
                bh, bw = max(h // grid, 1), max(w // grid, 1)
                blocks = luma[: bh * grid, : bw * grid].reshape(grid, bh, grid, bw).mean(axis=(1, 3))
                feats.append(",".join(f"{v:.3f}" for v in blocks.ravel()))
                phashes.append(codecs.phash64(px))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "feature": feats,
                    "phash": np.array(phashes, dtype=np.int64),
                }
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema)
