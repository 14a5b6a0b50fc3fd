"""Real BMP (Windows DIB) codec — stdlib struct + numpy, zero external deps.

Closes the uncompressed-interchange seam of A16: the ImagesPipeline
([U scrapy/pipelines/images.py] ``convert_image``) accepts whatever PIL
opens — BMP being the classic uncompressed arrival format — and re-encodes
to JPEG. Like rcspark.png/jpeg/gif/webp, the bytes here are REAL,
interoperable BMP: any stock viewer opens the encoder's output, and the
decoder reads files produced by stock tools within the documented subset.

Subset (spec: BITMAPFILEHEADER + BITMAPINFOHEADER, Windows 3.x "BM" DIB):
- decode: BI_RGB (compression 0) at 24 bpp (BGR triples) and 8 bpp
  (palettized, BGRX palette), bottom-up (height > 0) AND top-down
  (height < 0) row orders, 4-byte row padding, arbitrary pixel-data
  offset (``bfOffBits``); hostile bytes raise ValueError (never crash,
  never over-read).
- encode: deterministic 24 bpp BI_RGB bottom-up with the canonical
  54-byte header — byte-stable for fixed input pixels.

The independent twin (scripts/bmp_twin.py) re-reads the same subset with
its own scalar struct walk + per-pixel loops; the driver queries
(img_bmp_roundtrip / img_transcode_bmp_jpeg) hash both sides.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")   # magic, file size, res1, res2, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")

MAX_DIM = 1 << 15  # hostile-bytes guard: 32768 px per side is far beyond fixtures


def encode_bmp(pix: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → 24-bit BI_RGB bottom-up BMP bytes."""
    if pix.ndim != 3 or pix.shape[2] != 3 or pix.dtype != np.uint8:
        raise ValueError("encode_bmp wants uint8 (h, w, 3)")
    h, w = pix.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pix[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    body = rows.tobytes()
    info = _INFO_HDR.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = _FILE_HDR.pack(b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 (h, w, 3) RGB. Supports the documented subset."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    _, _fsize, _, _, off = _FILE_HDR.unpack_from(data, 0)
    (hsize, w, h_signed, planes, bpp, comp, _isz, _xr, _yr, used, _imp) = (
        _INFO_HDR.unpack_from(data, 14)
    )
    if hsize < 40:
        raise ValueError("pre-BITMAPINFOHEADER DIBs unsupported")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise ValueError(f"bad dimensions {w}x{h_signed}")
    if planes != 1 or comp != 0 or bpp not in (8, 24):
        raise ValueError(f"unsupported BMP variant planes={planes} bpp={bpp} comp={comp}")
    stride = (w * (bpp // 8) + 3) & ~3
    need = off + stride * h
    if off < 14 + hsize or need > len(data):
        raise ValueError("truncated BMP")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return bgr[:, :, ::-1].copy()
    # 8 bpp palettized: palette of `used` (0 → 256) BGRX entries after the header
    n_pal = used if used else 256
    pal_off = 14 + hsize
    if pal_off + 4 * n_pal > off:
        raise ValueError("palette overruns pixel offset")
    pal = np.frombuffer(data, dtype=np.uint8, count=4 * n_pal, offset=pal_off)
    pal = pal.reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRX → RGB
    idx = rows[:, :w]
    if int(idx.max(initial=0)) >= n_pal:
        raise ValueError("palette index out of range")
    return pal[idx].copy()
