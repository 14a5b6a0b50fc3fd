"""Real PNG codec — stdlib zlib + numpy, no external imaging library.

Closes (for PNG) the round-1/2 "real image codecs are sandbox stand-ins"
gap: the ImagesPipeline can ingest and emit actual PNG files that any
outside tool reads, not just the numpy PPM/QPPM stand-ins. Scope is the
still-overwhelmingly-common subset:

- decode: 8-bit greyscale (colour type 0), RGB (2) and RGBA (6),
  non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth),
  multiple IDAT chunks, CRC-verified chunk by chunk;
- encode: 8-bit RGB, filter 0, one IDAT — deterministic bytes
  (zlib level fixed), so digests are stable across runs.

Correctness evidence without PIL in the sandbox (tests/test_codecs.py):
round-trip identity, and a decoder check against an INDEPENDENT forward
implementation of the spec's filter functions (the test filters known
pixels per RFC 2083 §6, builds the PNG by hand, and the decoder must
recover the pixels exactly). JPEG (the lossy case) remains the documented
decode_external seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # colour type → samples per pixel


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (8-bit RGB, filter 0, non-interlaced)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)  # filter byte 0 per scanline
    idat = zlib.compress(raw.tobytes(), compress_level)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8. Raises ValueError on anything
    outside the supported subset or on a CRC/structure violation."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, …) are CRC-checked then ignored
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, colour, compression, filt_method, interlace = ihdr
    if bit_depth != 8 or colour not in _CHANNELS:
        raise ValueError(f"unsupported PNG (bit depth {bit_depth}, colour {colour})")
    if compression != 0 or filt_method != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _CHANNELS[colour]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub — prefix-sum per channel offset, mod 256
            rec = line.copy()
            for x in range(ch, stride):
                rec[x] = (rec[x] + rec[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                rec[x] = (rec[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch)
