"""Exact Hamming near-dup (hamming_pairs / phash_pairs / md5-SimHash q52).

The operator claims recall 1 AND precision 1 (pigeonhole banding + verify),
so every test is an exact-set equality against an independent brute force —
numpy over random fingerprints, the real phash64 column of the synthetic
image table, and the DuckDB oracle for the registered query.
"""

from __future__ import annotations

import itertools

import duckdb
import numpy as np
import pytest

from ocel_ocpn_lakehouse_spark.functions import dedup as D
from ocel_ocpn_lakehouse_spark.images.synth import synth_images_df
from ocel_ocpn_lakehouse_spark.queries.textml import Q52_SQL, QUERIES

SF = "/root/testdata/sf0.001"
_MASK = (1 << 64) - 1


def _to_signed(v: int) -> int:
    v &= _MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK).count("1")


def _brute(rows: list[tuple[int, int]], max_dist: int) -> set[tuple[int, int, int]]:
    out = set()
    for (ia, fa), (ib, fb) in itertools.combinations(rows, 2):
        d = _hamming(fa, fb)
        if d <= max_dist:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            out.add((lo, hi, d))
    return out


def _planted_fps(seed: int = 3, n_base: int = 60, n_dups: int = 25) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    base = rng.integers(-(2**63), 2**63, size=n_base, dtype=np.int64)
    rows = [(i, int(v)) for i, v in enumerate(base)]
    nxt = n_base
    for j in range(n_dups):
        v = int(base[j % n_base])
        for b in rng.choice(64, size=int(rng.integers(0, 7)), replace=False):
            v = _to_signed(v ^ (1 << int(b)))
        rows.append((nxt, v))
        nxt += 1
    return rows


@pytest.mark.parametrize(
    "max_dist,blocks",
    [(3, None), (3, 8), (6, None), (0, None), (6, 64)],
)
def test_hamming_pairs_exact_vs_bruteforce(spark, max_dist, blocks):
    """Exact-set equality incl. sign-bit fingerprints, planted near-dups,
    oversized block counts (extra blocks may only add candidates, never
    lose pairs) and the degenerate d=0 (exact-dup) case."""
    rows = _planted_fps()
    df = spark.createDataFrame(rows, "id long, fp long")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in D.hamming_pairs(
            df, "id", "fp", max_dist=max_dist, nbits=64, blocks=blocks
        ).collect()
    }
    assert got == _brute(rows, max_dist)


def test_hamming_pairs_validation(spark):
    df = spark.createDataFrame([(1, 5)], "id long, fp long")
    with pytest.raises(ValueError, match="pigeonhole"):
        D.hamming_pairs(df, "id", "fp", max_dist=5, blocks=4)
    with pytest.raises(ValueError, match="empty blocks"):
        D.hamming_pairs(df, "id", "fp", max_dist=3, nbits=8, blocks=9)


def test_phash_pairs_finds_planted_image_neardups(spark):
    """On the synthetic image table (hot rows = noisy copies of shared base
    images), phash_pairs must equal the brute-force Hamming pairs over the
    actual phash64 column AND recover at least one planted cluster."""
    imgs = (
        synth_images_df(spark, n_rows=300, seed=7, hot_key_fraction=0.15, n_hot_bases=3)
        .select("image_id", "phash")
        .cache()
    )
    rows = [(r.image_id, r.phash) for r in imgs.collect()]
    want = _brute(rows, 6)
    got = {(r.id_a, r.id_b, r.dist) for r in D.phash_pairs(imgs, max_dist=6).collect()}
    assert got == want
    assert len(want) > 0  # the planted near-dup clusters are actually found
    imgs.unpersist()


def test_simhash_md5_signatures_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    a = {r["_id"]: r["sig"] for r in D.simhash_md5_signatures(docs).collect()}
    b = {r["_id"]: r["sig"] for r in D.simhash_md5_signatures(docs).collect()}
    assert a == b and len(a) == 50
    assert all(0 <= v < (1 << 62) for v in a.values())  # 62-bit, non-negative


def test_q52_matches_duckdb(spark):
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in QUERIES["q52_hamming_neardup"](spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = set(map(tuple, con.execute(Q52_SQL).fetchall()))
    assert got == want and len(got) > 0
