"""Numpy-only image codecs + fidelity metrics — SURVEY.md A16, FIXTURES.md §1.

The sandbox has no PIL/cv2/imageio, so the corpus "image bytes" use two tiny
deterministic codecs shared by the engine, the fixture generator, and the
oracle:

- ``ppm``  — binary P6 PPM, lossless.
- ``qppm`` — same container (magic ``Q6``) with per-channel 6-bit
  quantization ⇒ PSNR ≈ 43–47 dB vs the source, exercising the north rule's
  lossy PSNR≥40dB check without a real JPEG codec.

Also: PSNR, and an 8×8 average-hash perceptual hash packed into int64
(the corpus table's ``phash`` column per BASELINE.json input_hint).

On a real cluster the decode step would bind to a proper codec inside the
same vectorized UDFs (rcspark.datapipe.multimodal); the Spark-side plumbing
(schemas, batching, partitioning) is identical.
"""

from __future__ import annotations

import numpy as np

QUANT_BITS = 6  # qppm keeps the top 6 bits per channel


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) → binary P6 PPM bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def quantize(pixels: np.ndarray, bits: int = QUANT_BITS) -> np.ndarray:
    """Per-channel k-bit quantization with mid-step reconstruction."""
    drop = 8 - bits
    return (((pixels >> drop) << drop) | (1 << (drop - 1))).astype(np.uint8)


def encode_qppm(pixels: np.ndarray) -> bytes:
    """Lossy: quantize then store in a PPM-shaped container (magic Q6)."""
    h, w, _ = pixels.shape
    return b"Q6\n%d %d\n255\n" % (w, h) + quantize(pixels).tobytes()


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """bytes → (uint8 RGB array (h, w, 3), fmt). Raises ValueError on junk."""
    if data[:2] == b"P6":
        fmt = "ppm"
    elif data[:2] == b"Q6":
        fmt = "qppm"
    elif data[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png  # real interoperable codec (round 3)

        pix = decode_png(data)
        if pix.shape[2] == 1:  # greyscale → RGB for the uniform contract
            pix = np.repeat(pix, 3, axis=2)
        return np.ascontiguousarray(pix[:, :, :3]), "png"
    elif data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg  # real interoperable codec (round 4)

        pix = decode_jpeg(data)
        if pix.shape[2] == 1:
            pix = np.repeat(pix, 3, axis=2)
        return np.ascontiguousarray(pix), "jpeg"
    elif data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from .webp import decode_webp  # real VP8L lossless codec (round 4)

        return np.ascontiguousarray(decode_webp(data)[:, :, :3]), "webp"
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif  # real LZW palette codec (round 4)

        return np.ascontiguousarray(decode_gif(data)), "gif"
    else:
        raise ValueError(f"unknown magic {data[:2]!r}")
    # header: magic\nW H\n255\n
    nl1 = data.index(b"\n")
    nl2 = data.index(b"\n", nl1 + 1)
    nl3 = data.index(b"\n", nl2 + 1)
    w, h = (int(t) for t in data[nl1 + 1 : nl2].split())
    pix = np.frombuffer(data, dtype=np.uint8, offset=nl3 + 1, count=w * h * 3)
    return pix.reshape(h, w, 3), fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def phash64(pixels: np.ndarray) -> int:
    """8×8 average-hash of the grayscale block-mean downsample → signed int64.

    Deterministic, numpy-only: grayscale = integer-mean of RGB; downsample by
    block mean over an 8×8 grid (edge blocks absorb the remainder); bit i is
    1 iff cell_i > overall mean. Bit order: row-major, MSB first.
    """
    g = pixels.astype(np.uint32).sum(axis=2) // 3
    h, w = g.shape
    ys = np.linspace(0, h, 9, dtype=np.int64)
    xs = np.linspace(0, w, 9, dtype=np.int64)
    cells = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            cells[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v
