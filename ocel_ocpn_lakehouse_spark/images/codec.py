"""Deterministic image codecs + perceptual hash + PSNR (numpy/zlib only).

The container ships no PIL/OpenCV, so the decode layer is self-contained:

- ``png`` — a REAL (standards-conforming) PNG encoder/decoder for 8-bit RGB
  with filter type 0. Lossless: bytes round-trip exactly. Any external PNG
  reader can open our files.
- ``jpeg`` — **DETERMINISTIC FAKE LOSSY CODEC** (clearly marked stub): real
  JPEG entropy coding is out of scope without codec libs; this container
  quantizes each channel to 6 bits (max per-pixel error 2 → PSNR ≈ 46 dB,
  comfortably ≥ the 40 dB gate in BASELINE.json input_hint) and deflates.
  The Spark-side plumbing (BinaryType columns, Arrow-batched decode UDFs,
  PSNR verification) is real and tested; swap `_lossy_*` for a real JPEG
  codec when one is available.

phash64 is a real DCT-based 64-bit perceptual hash (32×32 grayscale →
DCT-II → top-left 8×8 → median threshold), so Z-order clustering on phash
groups visually-similar images (north rule F10 key component).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_MAGIC = b"LSY1"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(arr: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) uint8 → PNG bytes (filter 0, standards-valid)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # bitdepth 8, truecolor
    rows = np.concatenate([np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(rows.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported"
    return raw[:, 1:].reshape(h, w, 3).copy()


def _lossy_encode(arr: np.ndarray) -> bytes:
    """STUB lossy codec (see module docstring): 6-bit quantize + deflate."""
    h, w, c = arr.shape
    q = (arr >> 2).astype(np.uint8)
    return _LOSSY_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def _lossy_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _LOSSY_MAGIC, "not a LSY1 payload"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    return ((q.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "jpeg":
        return _lossy_encode(arr)
    raise ValueError(f"unknown fmt {fmt}")


def decode_image(data: bytes) -> np.ndarray:
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:4] == _LOSSY_MAGIC:
        return _lossy_decode(data)
    raise ValueError("unknown image payload")


# ---- perceptual hash ---------------------------------------------------------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)
        _DCT32 = np.cos(np.pi / n * (k[None, :] + 0.5) * k[:, None])
    return _DCT32


def phash64(arr: np.ndarray) -> int:
    """DCT perceptual hash → signed int64 (Spark LongType-compatible)."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # box-resample to 32×32 via index mapping (no scipy)
    yi = (np.arange(32) * h // 32).clip(0, h - 1)
    xi = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[np.ix_(yi, xi)]
    m = _dct_matrix(32)
    dct = m @ small @ m.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])  # skip DC term
    bits = (block > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))  # wrap to signed for LongType


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
