import numpy as np
import pytest

from ocel_ocpn_lakehouse_spark.images.codec import (
    decode_image,
    encode_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
)


def test_png_roundtrip_exact():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    data = png_encode(arr)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = png_decode(data)
    assert (back == arr).all()


def test_png_deterministic():
    arr = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    assert png_encode(arr) == png_encode(arr.copy())


def test_lossy_psnr_above_40():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    data = encode_image(arr, "jpeg")
    back = decode_image(data)
    assert psnr(arr, back) >= 40.0


def test_phash_similar_images_close():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    noisy = np.clip(base.astype(np.int16) + rng.integers(-2, 3, base.shape), 0, 255).astype(
        np.uint8
    )
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    h0, h1, h2 = phash64(base), phash64(noisy), phash64(other)
    d_near = bin((h0 ^ h1) & (2**64 - 1)).count("1")
    d_far = bin((h0 ^ h2) & (2**64 - 1)).count("1")
    assert d_near < d_far
    assert d_near <= 10


def test_phash_is_int64():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    h = phash64(arr)
    assert -(2**63) <= h < 2**63


def test_unknown_fmt_rejected():
    with pytest.raises(ValueError):
        encode_image(np.zeros((4, 4, 3), np.uint8), "gif")
