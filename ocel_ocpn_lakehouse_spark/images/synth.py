"""Deterministic synthetic image+caption table generator (FIXTURES.md §1).

Rows are fully determined by (seed, i): pixels from a per-row PCG64 stream,
captions from a seeded word list, phash computed from the actual pixels.
Generation runs executor-side via ``mapInPandas`` over ``spark.range`` —
the driver never materializes image bytes, so the same generator produces
the 10^12-row design-point table on a real cluster by raising n_rows.

hot_key_fraction of rows are near-duplicates of a small set of base images
(tiny noise), so their phashes cluster in a narrow range — the skew
fixture for salting tests (reference skew metric:
ops/advanced_partitioning.py:54-59).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .codec import encode_image, phash64

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

_WORDS = (
    "amber bridge canyon dawn ember forest glacier harbor island juniper "
    "kestrel lagoon meadow nebula orchid prairie quartz river summit timber "
    "umber violet willow zenith basalt cedar delta fjord grove horizon"
).split()

_SIZES = np.array([16, 32, 64, 128])


def _gen_row(seed: int, i: int, n_hot_bases: int, hot_key_fraction: float) -> dict:
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
    hot = rng.random() < hot_key_fraction
    if hot:
        # near-duplicate of one of n_hot_bases base images → clustered phash
        base_idx = int(rng.integers(0, n_hot_bases))
        brng = np.random.default_rng(np.uint64(seed) * np.uint64(7_777_777) + np.uint64(base_idx))
        w = h = 32
        base = brng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        noise = rng.integers(-2, 3, size=(h, w, 3))
        arr = np.clip(base.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    else:
        w = int(_SIZES[rng.integers(0, len(_SIZES))])
        h = int(_SIZES[rng.integers(0, len(_SIZES))])
        # low-frequency pattern + noise → compressible, phash-meaningful
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        f1, f2 = rng.random(2) * 0.3 + 0.02
        base = (
            127
            + 100 * np.sin(f1 * xx + rng.random() * 6.28)
            + 100 * np.cos(f2 * yy + rng.random() * 6.28)
        ) / 2
        arr = np.clip(
            base[..., None] + rng.integers(0, 60, size=(h, w, 3)), 0, 255
        ).astype(np.uint8)
    fmt = "png" if rng.random() < 0.8 else "jpeg"
    data = encode_image(arr, fmt)
    n_words = int(rng.integers(5, 21))
    caption = " ".join(_WORDS[int(k)] for k in rng.integers(0, len(_WORDS), n_words))
    return {
        "image_id": f"img_{i:012d}",
        "bytes": data,
        "w": int(arr.shape[1]),
        "h": int(arr.shape[0]),
        "fmt": fmt,
        "caption": caption,
        "phash": phash64(arr),
    }


def synth_images_df(
    spark: SparkSession,
    n_rows: int = 5_000,
    seed: int = 42,
    hot_key_fraction: float = 0.2,
    n_hot_bases: int = 4,
    parallelism: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation: one output row per id."""
    par = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_gen_row(seed, int(i), n_hot_bases, hot_key_fraction) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_rows, numPartitions=par)
        .mapInPandas(gen, IMAGE_SCHEMA)
    )


def synth_merge_source_df(
    spark: SparkSession,
    n_target_rows: int,
    seed: int = 42,
    update_frac: float = 0.10,
    delete_frac: float = 0.05,
    insert_frac: float = 0.05,
) -> DataFrame:
    """MERGE-source fixture (FIXTURES.md §2.1): deterministic mix of
    updates (new caption + bytes for existing ids), deletes, inserts."""
    rng = np.random.default_rng(seed + 1)
    ids = rng.permutation(n_target_rows)
    n_upd = int(n_target_rows * update_frac)
    n_del = int(n_target_rows * delete_frac)
    n_ins = int(n_target_rows * insert_frac)
    upd_ids = ids[:n_upd]
    del_ids = ids[n_upd : n_upd + n_del]
    ins_ids = np.arange(n_target_rows, n_target_rows + n_ins)

    spec = (
        [(int(i), "upsert", 1) for i in upd_ids]
        + [(int(i), "delete", 0) for i in del_ids]
        + [(int(i), "upsert", 2) for i in ins_ids]
    )
    spec_df = spark.createDataFrame(spec, "row_id long, _op string, variant int")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, op, variant in zip(pdf["row_id"], pdf["_op"], pdf["variant"]):
                if op == "delete":
                    out.append(
                        {
                            "image_id": f"img_{int(rid):012d}",
                            "bytes": b"",
                            "w": 0,
                            "h": 0,
                            "fmt": "png",
                            "caption": "",
                            "phash": 0,
                            "_op": "delete",
                        }
                    )
                else:
                    # variant shifts the per-row stream → different pixels
                    r = _gen_row(seed + 100 + int(variant), int(rid), 4, 0.0)
                    r["_op"] = "upsert"
                    out.append(r)
            yield pd.DataFrame(out)

    schema = T.StructType(list(IMAGE_SCHEMA.fields) + [T.StructField("_op", T.StringType(), False)])
    return spec_df.mapInPandas(gen, schema)
