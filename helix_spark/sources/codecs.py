"""Image codecs for the `images` payload table — stdlib + numpy only.

This container has no PIL/libjpeg, so:

- PNG is implemented for real (public spec: RFC 2083 / W3C PNG): 8-bit RGB,
  filter type 0, zlib-compressed IDAT. Encode/decode round-trips byte-exactly
  on the pixel level → satisfies the input_hint's lossless invariant.

- "jpeg" rows use a DETERMINISTIC FAKE LOSSY CODEC (clearly marked): pixels
  are quantized (round-to-multiple-of-2) and zlib-packed behind a 'FAKELSY1'
  magic. Quantization noise gives PSNR ≈ 54 dB ≥ 40 dB, satisfying the lossy
  invariant deterministically. The Spark-side plumbing (binary column, batch
  decode UDF signature, PSNR check) is real and tested; swap `encode_lossy` /
  `decode_lossy` for a real JPEG codec when one is available.

phash: 64-bit average-hash over an 8x8 block-mean of the luma channel —
a standard public perceptual-hash construction.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
FAKE_LOSSY_MAGIC = b"FAKELSY1"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 → PNG bytes (filter 0 per scanline)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8. Supports what encode_png emits (filter 0-4)."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            assert bit_depth == 8 and color_type == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros_like(rows)
    bpp = 3
    for y in range(h):
        f, cur = filters[y], rows[y].copy()
        prev = out[y - 1] if y > 0 else np.zeros_like(cur)
        if f == 0:
            out[y] = cur
        elif f == 2:  # up
            out[y] = (cur + prev) % 256
        else:  # sub/average/paeth need sequential passes
            line = np.zeros_like(cur)
            for x in range(len(cur)):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = out[y - 1][x - bpp] if (y > 0 and x >= bpp) else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (cur[x] + pred) % 256
            out[y] = line
    return out.astype(np.uint8).reshape(h, w, 3)


# --------------------------------------------------------------------- lossy
def encode_lossy(pixels: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE lossy codec (no libjpeg in this container).
    Quantizes to even values → PSNR ≈ 54 dB vs the original."""
    h, w, _ = pixels.shape
    q = (pixels.astype(np.uint16) + 1) // 2  # values 0..128
    return (
        FAKE_LOSSY_MAGIC
        + struct.pack(">II", w, h)
        + zlib.compress(q.astype(np.uint8).tobytes(), 6)
    )


def decode_lossy(data: bytes) -> np.ndarray:
    assert data[:8] == FAKE_LOSSY_MAGIC, "not a fake-lossy payload"
    w, h = struct.unpack(">II", data[8:16])
    q = np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8).reshape(h, w, 3)
    return np.clip(q.astype(np.uint16) * 2, 0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        return decode_lossy(data)
    raise NotImplementedError(f"unsupported image format: {fmt}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(pixels: np.ndarray) -> int:
    """Average-hash: 8x8 block-mean luma vs global mean → 64 sign bits."""
    luma = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = luma[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        val |= b << np.uint64(i)
    return int(val.astype(np.int64))  # store as signed int64 column
