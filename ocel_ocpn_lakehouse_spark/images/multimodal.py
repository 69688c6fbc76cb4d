"""Multimodal column operators: decode, feature-extract, resize,
frame-sample — Arrow-batched ``mapInPandas`` pipelines over opaque
``binary`` payload columns with typed metadata.

The Spark-side plumbing (schemas, batch iteration, partitioning behavior)
is real and tested. The codec layer is this repo's deterministic
numpy/zlib codec (images/codec.py); payloads in formats we do not ship a
decoder for raise ``NotImplementedError`` (clearly-marked stub per the
build contract — swap in PIL/libjpeg/ffmpeg decoders on a real cluster).

"Video" here is a deterministic container: ``FSEQ`` magic + frame count +
length-prefixed encoded frames; frame_sample extracts every k-th frame —
the plumbing (one binary in → many binary out via explode-shaped
mapInPandas) matches what a real ffmpeg-backed sampler needs.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .codec import decode_image, encode_image

_FSEQ_MAGIC = b"FSEQ"

FEATURE_SCHEMA = (
    "image_id string, w int, h int, fmt string, "
    "mean_r double, mean_g double, mean_b double, brightness double, contrast double"
)

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"

FRAME_SCHEMA = "video_id string, frame_idx int, bytes binary, w int, h int"


def _decode_or_raise(b: bytes) -> np.ndarray:
    try:
        return decode_image(bytes(b))
    except ValueError as e:
        raise NotImplementedError(
            "payload format not supported by the in-repo codec; plug a real "
            "decoder (PIL/libjpeg) here on a cluster with codec libs"
        ) from e


def extract_features(df: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) → per-image channel stats. Pixels never
    leave the executor; the driver sees only scalar features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                arr = _decode_or_raise(b).astype(np.float64)
                rows.append(
                    {
                        "image_id": iid,
                        "w": arr.shape[1],
                        "h": arr.shape[0],
                        "fmt": fmt,
                        "mean_r": float(arr[..., 0].mean()),
                        "mean_g": float(arr[..., 1].mean()),
                        "mean_b": float(arr[..., 2].mean()),
                        "brightness": float(arr.mean()),
                        "contrast": float(arr.std()),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int, out_fmt: str = "png") -> DataFrame:
    """Nearest-neighbor resize, re-encoded with the repo codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b in zip(pdf["image_id"], pdf["bytes"]):
                arr = _decode_or_raise(b)
                h, w, _ = arr.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                out = arr[np.ix_(yi, xi)]
                rows.append(
                    {
                        "image_id": iid,
                        "bytes": encode_image(out, out_fmt),
                        "w": out_w,
                        "h": out_h,
                        "fmt": out_fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)


# ---- deterministic frame-sequence ("video") container ------------------------


def pack_frames(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    payloads = [encode_image(f, fmt) for f in frames]
    out = [_FSEQ_MAGIC, struct.pack(">I", len(payloads))]
    for p in payloads:
        out.append(struct.pack(">I", len(p)))
        out.append(p)
    return b"".join(out)


def unpack_frames(data: bytes) -> list[bytes]:
    if data[:4] != _FSEQ_MAGIC:
        raise NotImplementedError(
            "not an FSEQ container; real video needs an ffmpeg-backed sampler"
        )
    (n,) = struct.unpack(">I", data[4:8])
    pos, frames = 8, []
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        frames.append(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return frames


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """(video_id, bytes) → one row per sampled frame (1-in-N flat map)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, b in zip(pdf["video_id"], pdf["bytes"]):
                for idx, fb in enumerate(unpack_frames(bytes(b))):
                    if idx % every_k:
                        continue
                    arr = decode_image(fb)
                    rows.append(
                        {
                            "video_id": vid,
                            "frame_idx": idx,
                            "bytes": fb,
                            "w": arr.shape[1],
                            "h": arr.shape[0],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("video_id", "bytes").mapInPandas(run, FRAME_SCHEMA)
