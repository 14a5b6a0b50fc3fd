"""Real baseline JPEG codec — stdlib + numpy, no external imaging library.

Closes the last A16 codec seam (VERDICT r3 item 7; [U
scrapy/pipelines/images.py] converts everything it stores to JPEG): the
ImagesPipeline can now ingest and emit actual ITU-T T.81 baseline JPEG
files that any outside tool reads, alongside the round-3 PNG codec.

Scope — the overwhelmingly-common baseline subset:

- decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components, any
  sampling factors (4:4:4 / 4:2:0 / 4:2:2 via generic nearest-neighbor
  upsampling), multi-table DQT/DHT, restart intervals (DRI/RSTn),
  byte-stuffing, APPn/COM skip;
- encode: baseline, quality-scaled Annex-K quantization tables, standard
  Annex-K Huffman tables, 4:4:4 or 4:2:0, greyscale or RGB —
  deterministic bytes (no RNG, fixed arithmetic), so corpus digests are
  stable across runs.

Determinism contract (the kmeans/_div_half_away pattern applied to a
codec): the DECODER's arithmetic is exact fixed-point integer end to end —
IDCT uses the literal integer basis table ``IDCT_TABLE`` (round(C(u)·
cos((2x+1)uπ/16)·2048), the classic libjpeg-style scaled-integer IDCT) and
YCbCr→RGB uses 16-bit fixed-point literals — so ANY two implementations of
this contract produce bit-identical uint8 pixels regardless of summation
order or vectorization. scripts/jpeg_twin.py is exactly that: an
independently-written scalar spec-forward decoder; tests/test_codecs.py
pins both decoders equal on every fixture (the PNG independent-twin
pattern). T.81 itself does not mandate an IDCT realization; fixed-point
is the standard conforming choice.

The encoder's FDCT runs in float (encoder freedom under T.81 — only the
bitstream syntax is normative) but through one fixed numpy expression, so
its bytes are reproducible.
"""

from __future__ import annotations

import math
import struct

import numpy as np

SOI = b"\xff\xd8"
EOI = b"\xff\xd9"


def _make_zigzag() -> list[int]:
    """Natural (row-major) index of each zigzag position, generated from
    the diagonal-walk definition rather than a transcribed table."""
    order = []
    for s in range(15):
        pts = [(r, s - r) for r in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            pts.reverse()
        order.extend(r * 8 + c for r, c in pts)
    return order


ZIGZAG = _make_zigzag()

# Annex K.1/K.2 quantization tables (natural order).
QUANT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (bits[1..16], values). Even if a
# transcription differed from Annex K these files would stay fully valid —
# every decoder (ours included) reads DHT from the stream — but the
# canonical-prefix sanity check below guards structural validity.
BITS_DC_LUM = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
VALS_DC_LUM = list(range(12))
BITS_DC_CHROM = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
VALS_DC_CHROM = list(range(12))
BITS_AC_LUM = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
VALS_AC_LUM = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
BITS_AC_CHROM = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
VALS_AC_CHROM = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical assignment; validates
    prefix feasibility (guards table-transcription errors at import)."""
    assert sum(bits) == len(vals), "DHT bits/vals mismatch"
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            assert code < (1 << length), "invalid Huffman table (code overflow)"
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# import-time validation of the four standard tables
for _b, _v in (
    (BITS_DC_LUM, VALS_DC_LUM),
    (BITS_DC_CHROM, VALS_DC_CHROM),
    (BITS_AC_LUM, VALS_AC_LUM),
    (BITS_AC_CHROM, VALS_AC_CHROM),
):
    _canonical_codes(_b, _v)

# exact-integer IDCT basis: IDCT_TABLE[u][x] = round(C(u)·cos((2x+1)uπ/16)
# · 2048), C(0)=1/√2 else 1. pixel = ((ΣΣ F·T[u,y]·T[v,x] + 2^23) >> 24)
# + 128 — pure int64, order-free, hence bit-identical across any
# implementation of this contract.
IDCT_SCALE_BITS = 24  # 4 · 2048²
IDCT_TABLE = np.array(
    [
        [
            round((1 / math.sqrt(2) if u == 0 else 1.0)
                  * math.cos((2 * x + 1) * u * math.pi / 16) * 2048)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.int64,
)

# fixed-point YCbCr→RGB (16-bit fractional constants, libjpeg-style)
# round(factor · 2^16) exactly — the twin re-derives these from the same
# formula, so a mis-rounded literal here is a contract violation
FIX_R_CR = 91881       # 1.402    · 2^16
FIX_G_CB = 22553       # 0.344136 · 2^16
FIX_G_CR = 46802       # 0.714136 · 2^16
FIX_B_CB = 116130      # 1.772    · 2^16

_FDCT_M = np.array(
    [
        [
            0.5 * (1 / math.sqrt(2) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables, clamped to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def sc(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int64)
    return sc(QUANT_LUM), sc(QUANT_CHROM)


# ----------------------------------------------------------------------------
# encoder
# ----------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put(0xFF >> (8 - pad), pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, offset-coded value) for the DC/AC magnitude coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def _encode_block(
    w: _BitWriter, coef_zz: np.ndarray, pred: int, dct: dict, act: dict
) -> int:
    dc = int(coef_zz[0])
    t, off = _magnitude(dc - pred)
    code, ln = dct[t]
    w.put(code, ln)
    if t:
        w.put(off, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s, off = _magnitude(v)
        code, ln = act[(run << 4) | s]
        w.put(code, ln)
        w.put(off, s)
        run = 0
    if last_nz < 63:
        code, ln = act[0x00]  # EOB
        w.put(code, ln)
    return dc


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _pad_to_block(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """plane (H8, W8) uint8 → zigzagged quantized coefficients
    (nby, nbx, 64) int32."""
    h, w = plane.shape
    blocks = (
        plane.astype(np.float64)
        .reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        - 128.0
    )
    d = np.einsum("uy,abyx,vx->abuv", _FDCT_M, blocks, _FDCT_M)
    q = np.round(d / qtab.astype(np.float64)).astype(np.int32)
    flat = q.reshape(q.shape[0], q.shape[1], 64)
    return flat[:, :, ZIGZAG]


def rgb_to_ycbcr(pixels: np.ndarray) -> np.ndarray:
    p = pixels.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(np.uint8)


def _exif_app1(orientation: int) -> bytes:
    """Minimal valid Exif APP1 payload: little-endian TIFF header + IFD0
    with the single Orientation (0x0112, SHORT) entry."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation {orientation} outside 1..8")
    tiff = (
        b"II*\x00" + struct.pack("<I", 8)  # byte order, magic, IFD0 offset
        + struct.pack("<H", 1)  # one entry
        + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
        + struct.pack("<I", 0)  # no next IFD
    )
    return b"Exif\x00\x00" + tiff


def read_exif_orientation(data: bytes) -> int:
    """Walk the marker stream for an Exif APP1 and return the Orientation
    tag (1..8); 1 (upright) when absent — the ImagesPipeline auto-orient
    contract ([U PIL ImageOps.exif_transpose] semantics). Handles both
    TIFF byte orders; stops at SOS."""
    if data[:2] != SOI:
        raise ValueError("not a JPEG")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            break
        # T.81 allows 0xFF fill bytes before a marker — skip them
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        if marker in (0xDA, 0xD9):
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2  # TEM/RSTn are standalone (no length field)
            continue
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        seg_end = i + 2 + seg_len  # IFD reads must stay inside the APP1
        if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
            t = i + 10
            order = data[t : t + 2]
            bo = {b"II": "little", b"MM": "big"}.get(bytes(order))
            if bo is not None:
                ifd = t + int.from_bytes(data[t + 4 : t + 8], bo)
                if ifd + 2 <= seg_end:
                    n = int.from_bytes(data[ifd : ifd + 2], bo)
                    for e in range(n):
                        q = ifd + 2 + 12 * e
                        if q + 12 > seg_end:
                            break  # hostile offset walking out of the segment
                        tag = int.from_bytes(data[q : q + 2], bo)
                        typ = int.from_bytes(data[q + 2 : q + 4], bo)
                        if tag == 0x0112 and typ == 3:
                            v = int.from_bytes(data[q + 8 : q + 10], bo)
                            if not 1 <= v <= 8:
                                raise ValueError(f"EXIF orientation {v} invalid")
                            return v
        i = seg_end
    return 1


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    exif_orientation: int | None = None,
) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grey uint8 → baseline JPEG bytes.
    ``subsample=True`` emits 4:2:0 (2×2 chroma), else 4:4:4.
    ``exif_orientation`` (1..8) plants an Exif APP1 Orientation tag —
    bytes are unchanged when None, so pre-existing fixtures are stable."""
    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[:, :, 0]
    grey = pixels.ndim == 2
    if not grey and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h,w,3) RGB or (h,w) grey uint8")
    if pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    h, w = pixels.shape[:2]
    qlum, qchrom = quality_tables(quality)
    qlum_zz = qlum.reshape(64)[ZIGZAG]
    qchrom_zz = qchrom.reshape(64)[ZIGZAG]

    out = bytearray(SOI)
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if exif_orientation is not None:
        out += _marker(0xE1, _exif_app1(exif_orientation))
    out += _marker(0xDB, bytes([0x00]) + bytes(int(x) for x in qlum_zz))
    if not grey:
        out += _marker(0xDB, bytes([0x01]) + bytes(int(x) for x in qchrom_zz))

    if grey:
        comps = [(1, 1, 1, 0)]  # (id, h, v, tq)
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, tq)
    out += _marker(0xC0, sof)

    out += _marker(0xC4, bytes([0x00]) + bytes(BITS_DC_LUM) + bytes(VALS_DC_LUM))
    out += _marker(0xC4, bytes([0x10]) + bytes(BITS_AC_LUM) + bytes(VALS_AC_LUM))
    if not grey:
        out += _marker(
            0xC4, bytes([0x01]) + bytes(BITS_DC_CHROM) + bytes(VALS_DC_CHROM)
        )
        out += _marker(
            0xC4, bytes([0x11]) + bytes(BITS_AC_CHROM) + bytes(VALS_AC_CHROM)
        )

    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dct_lum = _canonical_codes(BITS_DC_LUM, VALS_DC_LUM)
    act_lum = _canonical_codes(BITS_AC_LUM, VALS_AC_LUM)
    dct_chr = _canonical_codes(BITS_DC_CHROM, VALS_DC_CHROM)
    act_chr = _canonical_codes(BITS_AC_CHROM, VALS_AC_CHROM)

    if grey:
        planes = [pixels]
    else:
        ycc = rgb_to_ycbcr(pixels)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if subsample:
            for i in (1, 2):
                p = _pad_to_block(planes[i], 2, 2).astype(np.uint32)
                planes[i] = (
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2)
                    >> 2
                ).astype(np.uint8)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    coefs = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        # pad each component plane to its full MCU coverage (edge replicate)
        need_h, need_w = mcus_y * cv * 8, mcus_x * ch * 8
        ph, pw = plane.shape
        padded = np.pad(
            plane, ((0, need_h - ph), (0, need_w - pw)), mode="edge"
        )
        coefs.append(_fdct_quant(padded, qlum if tq == 0 else qchrom))

    wtr = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dct = dct_lum if cid == 1 else dct_chr
                act = act_lum if cid == 1 else act_chr
                for by in range(cv):
                    for bx in range(ch):
                        blk = coefs[ci][my * cv + by, mx * ch + bx]
                        preds[ci] = _encode_block(wtr, blk, preds[ci], dct, act)
    out += wtr.flush()
    out += EOI
    return bytes(out)


# ----------------------------------------------------------------------------
# decoder
# ----------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def get(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _decode_tables(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    codes = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in codes.items()}

def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.get(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Destuffed entropy chunks split at RSTn markers, plus the position of
    the marker that ended the scan."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            segs.append(bytes(cur))
            return segs, i
    segs.append(bytes(cur))
    return segs, n


def ycbcr_to_rgb_int(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Exact fixed-point YCbCr→RGB (shared decode contract with the twin)."""
    y = y.astype(np.int64)
    cbd = cb.astype(np.int64) - 128
    crd = cr.astype(np.int64) - 128
    half = 1 << 15
    r = y + ((FIX_R_CR * crd + half) >> 16)
    g = y - ((FIX_G_CB * cbd + FIX_G_CR * crd + half) >> 16)
    b = y + ((FIX_B_CB * cbd + half) >> 16)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, ncomp) uint8 (ncomp 1 or 3, RGB)."""
    if data[:2] != SOI:
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    H = W = 0
    restart_interval = 0
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl
                qtabs[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                htabs[(tc, th)] = _decode_tables(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, H, W, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan: list[dict] = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                comp["td"], comp["ta"] = tt >> 4, tt & 15
                scan.append(comp)
            segs, i = _entropy_segments(data, i + 2 + seglen)
            return _decode_scan(
                segs, scan, comps, H, W, qtabs, htabs, restart_interval
            )
        i += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(
    segs: list[bytes],
    scan: list[dict],
    comps: list[dict],
    H: int,
    W: int,
    qtabs: dict,
    htabs: dict,
    restart_interval: int,
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    interleaved = len(scan) > 1
    if interleaved:
        mcus_x = (W + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (H + 8 * vmax - 1) // (8 * vmax)
        units = [(c, c["h"], c["v"]) for c in scan]
    else:
        c = scan[0]
        cw = (W * c["h"] + hmax - 1) // hmax
        chh = (H * c["v"] + vmax - 1) // vmax
        mcus_x = (cw + 7) // 8
        mcus_y = (chh + 7) // 8
        units = [(c, 1, 1)]

    for c, ch, cv in units:
        c["coef"] = np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)

    n_mcus = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else n_mcus
    mcu = 0
    for seg in segs:
        if mcu >= n_mcus:
            break
        br = _BitReader(seg)
        preds = {c["id"]: 0 for c, _, _ in units}
        end = min(n_mcus, mcu + per_seg)
        while mcu < end:
            my, mx = divmod(mcu, mcus_x)
            for c, ch, cv in units:
                dct = htabs[(0, c["td"])]
                act = htabs[(1, c["ta"])]
                for by in range(cv):
                    for bx in range(ch):
                        coef = c["coef"][my * cv + by, mx * ch + bx]
                        t = _huff_decode(br, dct)
                        diff = _extend(br.get(t), t) if t else 0
                        preds[c["id"]] += diff
                        coef[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            coef[k] = _extend(br.get(s), s)
                            k += 1
            mcu += 1
    if mcu < n_mcus:
        raise ValueError(f"truncated entropy data ({mcu}/{n_mcus} MCUs)")

    planes = []
    for c, ch, cv in units:
        q = qtabs[c["tq"]].reshape(64)
        zz = np.array(ZIGZAG)
        blocks = np.zeros_like(c["coef"])
        # coef is zigzag-ordered; quant lives in natural order — scale each
        # zigzag slot by the quant value at its natural position, then place
        blocks[:, :, zz] = c["coef"] * q[zz]  # dequantize, un-zigzag
        b2 = blocks.reshape(blocks.shape[0], blocks.shape[1], 8, 8)
        s = np.einsum("abuv,uy,vx->abyx", b2, IDCT_TABLE, IDCT_TABLE)
        pix = ((s + (1 << (IDCT_SCALE_BITS - 1))) >> IDCT_SCALE_BITS) + 128
        pix = np.clip(pix, 0, 255).astype(np.uint8)
        nby, nbx = pix.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        planes.append(plane)

    if len(comps) == 1:
        return planes[0][:H, :W][:, :, None]

    # upsample each component to (H, W) by index replication
    full = []
    ys = np.arange(H)
    xs = np.arange(W)
    for (c, ch, cv), plane in zip(units, planes):
        yy = (ys * c["v"]) // vmax
        xx = (xs * c["h"]) // hmax
        full.append(plane[np.ix_(yy, xx)])
    return ycbcr_to_rgb_int(full[0], full[1], full[2])


# ---------------------------------------------------------------------------
# Exif metadata plant / whitelist scrub (privacy curation tier)
# ---------------------------------------------------------------------------
# Pinned APP1 byte layout (little-endian TIFF), so an independent scalar
# twin can re-derive scrubbed bytes bit-for-bit:
#   Exif\0\0  II*\0 <u32 8>
#   IFD0 (offset 8): n entries, each 12 bytes, then u32 next=0
#     with GPS:  n=2  (0x0112 SHORT orientation) (0x8825 LONG -> 38)
#     without:   n=1  (0x0112 SHORT orientation)           [_exif_app1]
#   GPS IFD (offset 38): n=4
#     (0x0001 ASCII2 latref) (0x0002 RATIONAL*3 -> 92)
#     (0x0003 ASCII2 lonref) (0x0004 RATIONAL*3 -> 116), next=0
#   data (92..139): lat then lon as (deg,1)(min,1)(sec*1e4,10000)
# Micro-degree split: deg = v // 1e6; min = (v % 1e6) * 60 // 1e6;
# sec_num = ((v % 1e6) * 60 % 1e6) * 60 * 10000 // 1e6.


def _exif_app1_gps(
    orientation: int, lat_micro: int, lon_micro: int
) -> bytes:
    """APP1 payload with Orientation + a GPS IFD (layout pinned above);
    negative micro-degrees map to the S/W hemisphere refs."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation {orientation} outside 1..8")

    def dms(v: int) -> tuple[int, int, int]:
        deg, rem = divmod(abs(v), 10**6)
        mn, rem2 = divmod(rem * 60, 10**6)
        return deg, mn, rem2 * 60 * 10000 // 10**6

    tiff = bytearray(b"II*\x00" + struct.pack("<I", 8))
    tiff += struct.pack("<H", 2)
    tiff += struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
    tiff += struct.pack("<HHII", 0x8825, 4, 1, 38)
    tiff += struct.pack("<I", 0)
    assert len(tiff) == 38
    latref = b"N\x00\x00\x00" if lat_micro >= 0 else b"S\x00\x00\x00"
    lonref = b"E\x00\x00\x00" if lon_micro >= 0 else b"W\x00\x00\x00"
    tiff += struct.pack("<H", 4)
    tiff += struct.pack("<HHI4s", 0x0001, 2, 2, latref)
    tiff += struct.pack("<HHII", 0x0002, 5, 3, 92)
    tiff += struct.pack("<HHI4s", 0x0003, 2, 2, lonref)
    tiff += struct.pack("<HHII", 0x0004, 5, 3, 116)
    tiff += struct.pack("<I", 0)
    assert len(tiff) == 92
    for v in (lat_micro, lon_micro):
        d, m, s4 = dms(v)
        tiff += struct.pack("<IIIIII", d, 1, m, 1, s4, 10000)
    assert len(tiff) == 140
    return b"Exif\x00\x00" + bytes(tiff)


def _find_exif_app1(data: bytes) -> tuple[int, int] | None:
    """(start, end) byte span of the Exif APP1 segment, or None."""
    if data[:2] != SOI:
        raise ValueError("not a JPEG")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            break
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        if marker in (0xDA, 0xD9):
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_end = i + 2 + int.from_bytes(data[i + 2 : i + 4], "big")
        if seg_end > len(data):
            # truncated/hostile declared length — never mis-span a
            # replacement region past the buffer (ADVICE r4)
            raise ValueError("JPEG segment length exceeds buffer")
        if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
            return i, seg_end
        i = seg_end
    return None


def plant_exif(
    data: bytes,
    orientation: int,
    gps_micro: tuple[int, int] | None = None,
) -> bytes:
    """Replace (or insert, right after SOI+APP0 run) the Exif APP1 with the
    pinned-layout payload; ``gps_micro`` = (lat, lon) in micro-degrees."""
    payload = (
        _exif_app1(orientation)
        if gps_micro is None
        else _exif_app1_gps(orientation, *gps_micro)
    )
    seg = _marker(0xE1, payload)
    span = _find_exif_app1(data)
    if span is not None:
        return data[: span[0]] + seg + data[span[1] :]
    # insert after any APP0 (JFIF) segments
    i = 2
    while i + 4 <= len(data) and data[i] == 0xFF and data[i + 1] == 0xE0:
        i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
    return data[:i] + seg + data[i:]


def scrub_exif_metadata(data: bytes) -> tuple[bytes, bool, int]:
    """Whitelist Exif scrub ([U scrapy pipelines/images + PIL exif docs]
    privacy pass a training corpus runs before storage): drop EVERYTHING in
    the Exif APP1 except the Orientation tag — GPS, serials, maker notes —
    by rebuilding the minimal orientation-only APP1 (removing the segment
    entirely when IFD0 carries no Orientation). Returns
    (scrubbed_bytes, had_gps, orientation). Idempotent by construction."""
    span = _find_exif_app1(data)
    if span is None:
        return data, False, 1
    i, seg_end = span
    t = i + 10
    bo = {b"II": "little", b"MM": "big"}.get(bytes(data[t : t + 2]))
    had_gps = False
    orientation = None
    if bo is not None:
        ifd = t + int.from_bytes(data[t + 4 : t + 8], bo)
        if ifd + 2 <= seg_end:
            n = int.from_bytes(data[ifd : ifd + 2], bo)
            for e in range(n):
                q = ifd + 2 + 12 * e
                if q + 12 > seg_end:
                    break
                tag = int.from_bytes(data[q : q + 2], bo)
                typ = int.from_bytes(data[q + 2 : q + 4], bo)
                if tag == 0x0112 and typ == 3:
                    v = int.from_bytes(data[q + 8 : q + 10], bo)
                    if 1 <= v <= 8:
                        orientation = v
                elif tag == 0x8825:
                    had_gps = True
    repl = b"" if orientation is None else _marker(0xE1, _exif_app1(orientation))
    return data[:i] + repl + data[seg_end:], had_gps, orientation or 1


# -- IFD1 embedded thumbnail (Exif §4.6.3; [U PIL Image.thumbnail /
# piexif "1st" IFD]) -----------------------------------------------------------
# Cameras store a small JPEG INSIDE the Exif APP1: IFD0's next-IFD pointer
# leads to IFD1, whose JPEGInterchangeFormat (0x0201) / -Length (0x0202)
# tags span the compressed thumbnail. Layout written here (all offsets
# relative to the TIFF header):
#   8   IFD0: n=1 (0x0112 Orientation SHORT), next-IFD -> 26
#   26  IFD1: n=2 (0x0201 LONG -> 56) (0x0202 LONG = len), next = 0
#   56  thumbnail JPEG bytes
# The privacy relevance: a scrubbed corpus must drop IFD1 too — the
# thumbnail is rendered from the ORIGINAL frame, so it leaks anything a
# crop/redact removed. scrub_exif_metadata rebuilds an orientation-only
# APP1, which strips IFD1 by construction; read_exif_thumbnail makes that
# checkable from the bytes.


def _exif_app1_thumb(orientation: int, thumb: bytes) -> bytes:
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation {orientation} outside 1..8")
    tiff = bytearray(b"II*\x00" + struct.pack("<I", 8))
    tiff += struct.pack("<H", 1)
    tiff += struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
    tiff += struct.pack("<I", 26)  # next IFD = IFD1
    assert len(tiff) == 26
    tiff += struct.pack("<H", 2)
    tiff += struct.pack("<HHII", 0x0201, 4, 1, 56)
    tiff += struct.pack("<HHII", 0x0202, 4, 1, len(thumb))
    tiff += struct.pack("<I", 0)
    assert len(tiff) == 56
    tiff += thumb
    payload = b"Exif\x00\x00" + bytes(tiff)
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("thumbnail too large for one APP1 segment")
    return payload


def plant_exif_thumbnail(data: bytes, orientation: int, thumb: bytes) -> bytes:
    """Replace (or insert after the APP0 run) the Exif APP1 with an
    Orientation + IFD1-thumbnail payload (layout pinned above)."""
    seg = _marker(0xE1, _exif_app1_thumb(orientation, thumb))
    span = _find_exif_app1(data)
    if span is not None:
        return data[: span[0]] + seg + data[span[1] :]
    i = 2
    while i + 4 <= len(data) and data[i] == 0xFF and data[i + 1] == 0xE0:
        i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
    return data[:i] + seg + data[i:]


def read_exif_thumbnail(data: bytes) -> tuple[bytes | None, int]:
    """(IFD1 embedded thumbnail bytes or None, IFD0 orientation). Follows
    IFD0's next-IFD pointer; every offset/length is bounds-checked against
    the APP1 segment end (hostile declared lengths never mis-span)."""
    span = _find_exif_app1(data)
    if span is None:
        return None, 1
    i, seg_end = span
    t = i + 10
    bo = {b"II": "little", b"MM": "big"}.get(bytes(data[t : t + 2]))
    if bo is None:
        return None, 1
    orientation = 1
    ifd0 = t + int.from_bytes(data[t + 4 : t + 8], bo)
    if ifd0 + 2 > seg_end:
        return None, 1
    n = int.from_bytes(data[ifd0 : ifd0 + 2], bo)
    for e in range(n):
        q = ifd0 + 2 + 12 * e
        if q + 12 > seg_end:
            return None, orientation
        tag = int.from_bytes(data[q : q + 2], bo)
        typ = int.from_bytes(data[q + 2 : q + 4], bo)
        if tag == 0x0112 and typ == 3:
            v = int.from_bytes(data[q + 8 : q + 10], bo)
            if 1 <= v <= 8:
                orientation = v
    nxt = ifd0 + 2 + 12 * n
    if nxt + 4 > seg_end:
        return None, orientation
    ifd1_off = int.from_bytes(data[nxt : nxt + 4], bo)
    if ifd1_off == 0:
        return None, orientation
    ifd1 = t + ifd1_off
    if ifd1 + 2 > seg_end:
        return None, orientation
    n1 = int.from_bytes(data[ifd1 : ifd1 + 2], bo)
    off = ln = None
    for e in range(n1):
        q = ifd1 + 2 + 12 * e
        if q + 12 > seg_end:
            return None, orientation
        tag = int.from_bytes(data[q : q + 2], bo)
        typ = int.from_bytes(data[q + 2 : q + 4], bo)
        if tag == 0x0201 and typ == 4:
            off = int.from_bytes(data[q + 8 : q + 12], bo)
        elif tag == 0x0202 and typ == 4:
            ln = int.from_bytes(data[q + 8 : q + 12], bo)
    if off is None or ln is None:
        return None, orientation
    start, end = t + off, t + off + ln
    if end > seg_end or start < t:
        raise ValueError("EXIF thumbnail span exceeds APP1 segment")
    return bytes(data[start:end]), orientation
