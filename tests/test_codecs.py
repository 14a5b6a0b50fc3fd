from __future__ import annotations

import numpy as np

from rcspark.codecs import (
    decode_image,
    encode_ppm,
    encode_qppm,
    phash64,
    psnr,
    quantize,
)


def _img(seed=0, h=32, w=48):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_lossless():
    img = _img(1)
    out, fmt = decode_image(encode_ppm(img))
    assert fmt == "ppm"
    assert np.array_equal(out, img)


def test_qppm_psnr_in_lossy_band():
    img = _img(2, 64, 64)
    out, fmt = decode_image(encode_qppm(img))
    assert fmt == "qppm"
    assert np.array_equal(out, quantize(img))
    p = psnr(img, out)
    assert 40.0 <= p <= 50.0, p


def test_psnr_inf_on_equal():
    img = _img(3)
    assert psnr(img, img) == float("inf")


def test_phash_deterministic_and_robust():
    img = _img(4, 64, 64)
    h1 = phash64(img)
    assert h1 == phash64(img.copy())
    assert isinstance(h1, int)
    # quantization shouldn't move the perceptual hash much
    h2 = phash64(quantize(img))
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 6
