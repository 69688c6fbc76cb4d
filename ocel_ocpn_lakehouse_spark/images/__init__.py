"""Image payload handling: codecs, perceptual hash, PSNR, synthesis.

Per BASELINE.json input_hint all pixel work is vectorized pandas/Arrow
UDFs over BinaryType columns — no per-row Python UDFs anywhere.
"""

from .codec import (
    decode_image,
    encode_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
)

__all__ = ["encode_image", "decode_image", "png_encode", "png_decode", "phash64", "psnr"]
