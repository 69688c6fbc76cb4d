"""Z-order / Hilbert clustering keys (SURVEY §2.7 F10, north-rule core).

The reference maintains 1-D multi-column sort orders "for temporal
locality" (ops/performance_optimization.py:231-235,263-267); the north
rule upgrades this to a space-filling curve over
``(phash, w, h, xxhash64(image_id))``.

``zorder_key4`` is a PURE COLUMN EXPRESSION — 4×16-bit → 64-bit Morton
interleave via magic-number bit spreading (4 shift/or/mask steps per
column), entirely inside whole-stage codegen: no UDF, no Python in the
hot path. The xxhash64(image_id) component doubles as an implicit salt:
rows sharing a hot phash range still spread across the curve (north rule:
"salting for phash hot-spots").

``hilbert_key4`` is the Hilbert variant (better locality, costlier) as a
vectorized pandas UDF implementing Skilling's transform in numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LONG_SIGN_FLIP = -(2**63)  # XOR with this maps unsigned order → signed order


def _spread4(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` so bit i lands at position 4*i."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 24))).bitwiseAND(F.lit(0x000000FF000000FF))
    x = (x.bitwiseOR(F.shiftleft(x, 12))).bitwiseAND(F.lit(0x000F000F000F000F))
    x = (x.bitwiseOR(F.shiftleft(x, 6))).bitwiseAND(F.lit(0x0303030303030303))
    x = (x.bitwiseOR(F.shiftleft(x, 3))).bitwiseAND(F.lit(0x1111111111111111))
    return x


def to_u16(col: Column, input_bits: int = 16) -> Column:
    """Map a long column to its top-16-bit unsigned representation."""
    if input_bits <= 16:
        return col.cast("long").bitwiseAND(F.lit(0xFFFF))
    return F.shiftrightunsigned(col.cast("long"), input_bits - 16).bitwiseAND(F.lit(0xFFFF))


def zorder_key4(a: Column, b: Column, c: Column, d: Column) -> Column:
    """64-bit Morton key from four 16-bit (pre-normalized) columns.

    Dimension significance: ``a`` owns bit 63 (most significant within
    each interleave round), then b, c, d. Output is sign-flipped so
    ascending LongType order equals unsigned curve order (bit 63 would
    otherwise sort negatives first).
    """
    z = (
        F.shiftleft(_spread4(a), 3)
        .bitwiseOR(F.shiftleft(_spread4(b), 2))
        .bitwiseOR(F.shiftleft(_spread4(c), 1))
        .bitwiseOR(_spread4(d))
    )
    return z.bitwiseXOR(F.lit(_LONG_SIGN_FLIP))


def _spread3(col: Column) -> Column:
    """Spread low 16 bits so bit i lands at position 3*i (Part1By2 masks,
    valid for up to 21 input bits)."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 32))).bitwiseAND(F.lit(0x001F00000000FFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 16))).bitwiseAND(F.lit(0x001F0000FF0000FF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x100F00F00F00F00F))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x10C30C30C30C30C3))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x1249249249249249))
    return x


def zorder_key3_salted(a: Column, b: Column, c: Column, salt: Column) -> Column:
    """48-bit Morton interleave of three 16-bit columns (a most
    significant) with a 16-bit salt as the LOW-ORDER suffix.

    Why the salt is a suffix and not a fourth interleave dimension: when
    the leading dimension's top bits have low entropy (real phash corpora
    concentrate), an interleaved salt's high bits outrank every
    informative key bit and range boundaries end up splitting on salt —
    per-file phash bounds stay full-width and pruning dies. As a suffix
    the salt only breaks ties WITHIN identical (a,b,c) cells, which is
    exactly the hot-spot case: quantile boundaries can still fall inside
    a hot cell and spread it over several files/tasks (north rule:
    "salting for phash hot-spots") while every split above tie level
    follows the data columns."""
    z3 = (
        F.shiftleft(_spread3(a), 2)
        .bitwiseOR(F.shiftleft(_spread3(b), 1))
        .bitwiseOR(_spread3(c))
    )
    return F.shiftleft(z3, 16).bitwiseOR(salt.bitwiseAND(F.lit(0xFFFF))).bitwiseXOR(
        F.lit(_LONG_SIGN_FLIP)
    )


def id_salt16(image_id: Column) -> Column:
    """16-bit id-hash salt lane: crc32(utf8(id)) & 0xFFFF.

    crc32 (not xxhash64) so the salt is computable bit-identically in
    numpy (zlib.crc32) — the Arrow-native cluster rewrite recomputes the
    curve key executor-side in numpy and the two paths must agree
    (asserted by test_curve_key_numpy_parity)."""
    return F.crc32(F.encode(image_id, "UTF-8")).bitwiseAND(F.lit(0xFFFF))


def image_zorder_key(
    phash: Column | str = "phash",
    w: Column | str = "w",
    h: Column | str = "h",
    image_id: Column | str = "image_id",
) -> Column:
    """The north-rule clustering key over (phash, w, h, crc32(image_id)):
    3-way interleave of the data columns + id-hash salt suffix."""
    phash = F.col(phash) if isinstance(phash, str) else phash
    w = F.col(w) if isinstance(w, str) else w
    h = F.col(h) if isinstance(h, str) else h
    image_id = F.col(image_id) if isinstance(image_id, str) else image_id
    return zorder_key3_salted(
        to_u16(phash, 64),
        to_u16(w.cast("long"), 16),
        to_u16(h.cast("long"), 16),
        id_salt16(image_id),
    )


# ---- Hilbert variant ---------------------------------------------------------


def _hilbert_d(axes: list[np.ndarray], bits: int = 16) -> np.ndarray:
    """Skilling's transpose→Hilbert for len(axes) dims × `bits`, vectorized.

    Input: uint64 arrays with values < 2^bits. Output: uint64 Hilbert index.
    """
    n = len(axes)
    X = np.stack(axes).astype(np.uint64)  # (n, N)
    M = np.uint64(1) << np.uint64(bits - 1)
    # Inverse undo excess work (Skilling 2004, public-domain algorithm)
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            hit = (X[i] & Q) != 0
            # invert low bits of X[0] where hit, else exchange with X[i]
            X[0] = np.where(hit, X[0] ^ P, X[0])
            t = (X[0] ^ X[i]) & P
            X[0] ^= np.where(hit, np.uint64(0), t)
            X[i] ^= np.where(hit, np.uint64(0), t)
        Q >>= np.uint64(1)
    # Gray encode
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > np.uint64(1):
        t = np.where((X[n - 1] & Q) != 0, t ^ (Q - np.uint64(1)), t)
        Q >>= np.uint64(1)
    for i in range(n):
        X[i] ^= t
    # interleave transposed bits → index
    out = np.zeros_like(X[0])
    for bit in range(bits - 1, -1, -1):
        for i in range(n):
            out = (out << np.uint64(1)) | ((X[i] >> np.uint64(bit)) & np.uint64(1))
    return out


@F.pandas_udf(T.LongType())
def _hilbert4_udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
    res = _hilbert_d(
        [a.to_numpy(np.uint64), b.to_numpy(np.uint64), c.to_numpy(np.uint64), d.to_numpy(np.uint64)]
    )
    return pd.Series((res ^ np.uint64(1 << 63)).astype(np.int64))


@F.pandas_udf(T.LongType())
def _hilbert3_salted_udf(a: pd.Series, b: pd.Series, c: pd.Series, salt: pd.Series) -> pd.Series:
    res = _hilbert_d(
        [a.to_numpy(np.uint64), b.to_numpy(np.uint64), c.to_numpy(np.uint64)]
    )  # 48-bit index
    out = (res << np.uint64(16)) | (salt.to_numpy(np.uint64) & np.uint64(0xFFFF))
    return pd.Series((out ^ np.uint64(1 << 63)).astype(np.int64))


def hilbert_key4(a: Column, b: Column, c: Column, d: Column) -> Column:
    """64-bit Hilbert key from four 16-bit columns (Arrow-vectorized)."""
    return _hilbert4_udf(a, b, c, d)


def image_hilbert_key() -> Column:
    """Hilbert analog of image_zorder_key: 3-D curve over (phash, w, h)
    with the id-hash salt as low-order suffix (same rationale as
    zorder_key3_salted)."""
    return _hilbert3_salted_udf(
        to_u16(F.col("phash"), 64),
        to_u16(F.col("w").cast("long"), 16),
        to_u16(F.col("h").cast("long"), 16),
        id_salt16(F.col("image_id")),
    )


# ---- numpy mirrors (Arrow-native cluster rewrite) ----------------------------
#
# The cluster map job recomputes the curve key executor-side from Arrow
# column buffers; these mirrors are asserted bit-identical to the column
# expressions above (test_curve_key_numpy_parity), which is what makes the
# Spark key-scan quantile boundaries valid range cuts for numpy-computed
# keys.


def to_u16_np(x: np.ndarray, input_bits: int = 16) -> np.ndarray:
    x = x.astype(np.uint64)
    if input_bits <= 16:
        return x & np.uint64(0xFFFF)
    return (x >> np.uint64(input_bits - 16)) & np.uint64(0xFFFF)


def _spread3_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x001F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x001F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def zorder_key3_salted_np(
    a: np.ndarray, b: np.ndarray, c: np.ndarray, salt: np.ndarray
) -> np.ndarray:
    """int64 mirror of :func:`zorder_key3_salted`."""
    z3 = (_spread3_np(a) << np.uint64(2)) | (_spread3_np(b) << np.uint64(1)) | _spread3_np(c)
    out = (z3 << np.uint64(16)) | (salt.astype(np.uint64) & np.uint64(0xFFFF))
    return (out ^ np.uint64(1 << 63)).astype(np.int64)


def crc32_salt16_np(ids) -> np.ndarray:
    """numpy mirror of :func:`id_salt16` (zlib.crc32 == java.util.zip.CRC32)."""
    import zlib

    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) & 0xFFFF for s in ids),
        dtype=np.uint64,
        count=len(ids),
    )


def image_zorder_key_np(
    phash: np.ndarray, w: np.ndarray, h: np.ndarray, salt16: np.ndarray
) -> np.ndarray:
    return zorder_key3_salted_np(
        to_u16_np(phash, 64), to_u16_np(w, 16), to_u16_np(h, 16), salt16
    )


def image_hilbert_key_np(
    phash: np.ndarray, w: np.ndarray, h: np.ndarray, salt16: np.ndarray
) -> np.ndarray:
    res = _hilbert_d([to_u16_np(phash, 64), to_u16_np(w, 16), to_u16_np(h, 16)])
    out = (res << np.uint64(16)) | (salt16.astype(np.uint64) & np.uint64(0xFFFF))
    return (out ^ np.uint64(1 << 63)).astype(np.int64)


def hash_key_expr(cols: list[str]) -> Column:
    """Fallback clustering key for non-image tables: crc32 of the
    '\\x1f'-joined string forms — numpy-computable (hash_key_np)."""
    joined = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    return F.crc32(F.encode(joined, "UTF-8")).cast("long")


def hash_key_np(arrays: list) -> np.ndarray:
    """numpy mirror of :func:`hash_key_expr` — must match Spark's
    ``concat_ws`` semantics exactly: NULL values are skipped entirely (no
    separator emitted for them) and booleans render as 'true'/'false'.
    Float rendering differences are a documented limitation of the hash
    fallback (prefer int/string key columns)."""
    import zlib

    def fmt(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    n = len(arrays[0])
    joined = (
        "\x1f".join(fmt(a[i]) for a in arrays if a[i] is not None) for i in range(n)
    )
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in joined), dtype=np.int64, count=n
    )
