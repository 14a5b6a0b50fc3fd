"""Independent spec-forward baseline-JPEG decoder — the rcspark/jpeg.py twin.

Written deliberately differently from the engine decoder (the PNG
independent-twin pattern, tests/test_codecs.py): scalar Python ints, a
straight-line marker walk, per-bit Huffman tree walk over a dict built
here, direct four-nested-loop IDCT summation — no numpy in the decode
math, no code shared with rcspark.jpeg except the published decode
CONTRACT, which is data, not code:

  - the integer IDCT basis  T[u][x] = round(C(u)·cos((2x+1)uπ/16)·2048)
    (recomputed here from that formula), pixel = ((S + 2^23) >> 24) + 128;
  - 16-bit fixed-point YCbCr→RGB constants (re-derived here from the
    JFIF factors);
  - nearest-neighbor chroma upsampling  src = (dst · c_factor) // max_factor.

Because every step of the contract is exact integer arithmetic, this twin
and the vectorized engine decoder must agree BIT-FOR-BIT on every valid
baseline file — which tests/test_codecs.py asserts over the fixture set,
and scripts/gen_media_expected.py relies on for the img_jpeg_roundtrip
driver-gate oracle.
"""

from __future__ import annotations

import math
import struct


def _idct_basis() -> list[list[int]]:
    t = []
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        t.append(
            [round(cu * math.cos((2 * x + 1) * u * math.pi / 16.0) * 2048) for x in range(8)]
        )
    return t


_T = _idct_basis()
_R_CR = round(1.402 * 65536)
_G_CB = round(0.344136 * 65536)
_G_CR = round(0.714136 * 65536)
_B_CB = round(1.772 * 65536)

_ZZ_ROWCOL = []
for _s in range(15):
    _pts = [(_r, _s - _r) for _r in range(max(0, _s - 7), min(8, _s + 1))]
    if _s % 2 == 0:
        _pts.reverse()
    _ZZ_ROWCOL.extend(_pts)


class _Bits:
    """MSB-first bit cursor over a destuffed entropy chunk."""

    def __init__(self, chunk: bytes) -> None:
        self.chunk = chunk
        self.bitpos = 0

    def next_bit(self) -> int:
        byte_i, bit_i = divmod(self.bitpos, 8)
        self.bitpos += 1
        if byte_i >= len(self.chunk):
            return 0  # spec: pad bits read as if 0 past the end
        return (self.chunk[byte_i] >> (7 - bit_i)) & 1

    def take(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.next_bit()
        return v


def _build_huff(bits_counts: list[int], symbols: list[int]) -> dict:
    """Prefix-string → symbol map (the tree as a dict of '0'/'1' paths)."""
    table = {}
    code = 0
    si = 0
    for length in range(1, 17):
        for _ in range(bits_counts[length - 1]):
            table[format(code, f"0{length}b")] = symbols[si]
            si += 1
            code += 1
        code <<= 1
    return table


def _read_huff(bits: _Bits, table: dict) -> int:
    path = ""
    while len(path) <= 16:
        path += "1" if bits.next_bit() else "0"
        if path in table:
            return table[path]
    raise ValueError("twin: bad Huffman code")


def _signed(raw: int, nbits: int) -> int:
    if nbits == 0:
        return 0
    if raw >= (1 << (nbits - 1)):
        return raw
    return raw - (1 << nbits) + 1


def _idct_block(coef: list[int]) -> list[list[int]]:
    """coef: 64 dequantized values in NATURAL row-major order."""
    out = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0
            for u in range(8):
                for v in range(8):
                    s += coef[u * 8 + v] * _T[u][y] * _T[v][x]
            out[y][x] = ((s + (1 << 23)) >> 24) + 128
            if out[y][x] < 0:
                out[y][x] = 0
            elif out[y][x] > 255:
                out[y][x] = 255
    return out


def twin_decode_jpeg(data: bytes) -> list[list[list[int]]]:
    """bytes → pixels[y][x] = [r, g, b] (or [g] for greyscale)."""
    assert data[0] == 0xFF and data[1] == 0xD8, "twin: no SOI"
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame_comps: list[dict] = []
    height = width = 0
    dri = 0
    while pos < len(data):
        assert data[pos] == 0xFF, "twin: lost marker sync"
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:
            k = 0
            while k < len(body):
                precision, ident = body[k] >> 4, body[k] & 0x0F
                k += 1
                vals = []
                for _ in range(64):
                    if precision:
                        vals.append((body[k] << 8) | body[k + 1])
                        k += 2
                    else:
                        vals.append(body[k])
                        k += 1
                nat = [0] * 64
                for zi, (r, c) in enumerate(_ZZ_ROWCOL):
                    nat[r * 8 + c] = vals[zi]
                quant[ident] = nat
        elif marker == 0xC4:
            k = 0
            while k < len(body):
                cls, ident = body[k] >> 4, body[k] & 0x0F
                counts = list(body[k + 1 : k + 17])
                total = sum(counts)
                syms = list(body[k + 17 : k + 17 + total])
                huff[(cls, ident)] = _build_huff(counts, syms)
                k += 17 + total
        elif marker == 0xC0:
            height = (body[1] << 8) | body[2]
            width = (body[3] << 8) | body[4]
            for ci in range(body[5]):
                o = 6 + 3 * ci
                frame_comps.append(
                    {
                        "id": body[o],
                        "hs": body[o + 1] >> 4,
                        "vs": body[o + 1] & 0x0F,
                        "q": body[o + 2],
                    }
                )
        elif marker == 0xDD:
            dri = (body[0] << 8) | body[1]
        elif marker == 0xDA:
            for ci in range(body[0]):
                cid = body[1 + 2 * ci]
                sel = body[2 + 2 * ci]
                comp = [c for c in frame_comps if c["id"] == cid][0]
                comp["dc_t"], comp["ac_t"] = sel >> 4, sel & 0x0F
            return _twin_scan(data, pos, frame_comps, height, width, quant, huff, dri)
        # other markers (APPn/COM): skipped via length
    raise ValueError("twin: no scan")


def _twin_scan(data, pos, comps, height, width, quant, huff, dri):
    hs_max = max(c["hs"] for c in comps)
    vs_max = max(c["vs"] for c in comps)
    mcu_cols = -(-width // (8 * hs_max))
    mcu_rows = -(-height // (8 * vs_max))
    if len(comps) == 1:
        # single-component scan: MCU is one block over the full image grid
        mcu_cols = -(-width // 8)
        mcu_rows = -(-height // 8)
        hs_max = vs_max = comps[0]["hs"] = comps[0]["vs"] = 1

    # split entropy data at RST markers, removing stuffed zero bytes
    chunks: list[bytearray] = [bytearray()]
    k = pos
    while k < len(data):
        b = data[k]
        if b == 0xFF:
            follower = data[k + 1] if k + 1 < len(data) else 0xD9
            if follower == 0x00:
                chunks[-1].append(0xFF)
                k += 2
                continue
            if 0xD0 <= follower <= 0xD7:
                chunks.append(bytearray())
                k += 2
                continue
            break
        chunks[-1].append(b)
        k += 1

    for c in comps:
        bw = mcu_cols * c["hs"]
        bh = mcu_rows * c["vs"]
        c["plane"] = [[0] * (bw * 8) for _ in range(bh * 8)]

    total_mcus = mcu_rows * mcu_cols
    span = dri if dri else total_mcus
    mcu_index = 0
    for chunk in chunks:
        if mcu_index >= total_mcus:
            break
        bits = _Bits(bytes(chunk))
        last_dc = {c["id"]: 0 for c in comps}
        stop = min(total_mcus, mcu_index + span)
        while mcu_index < stop:
            mr, mc = divmod(mcu_index, mcu_cols)
            for c in comps:
                for vy in range(c["vs"]):
                    for vx in range(c["hs"]):
                        zz = [0] * 64
                        cat = _read_huff(bits, huff[(0, c["dc_t"])])
                        last_dc[c["id"]] += _signed(bits.take(cat), cat)
                        zz[0] = last_dc[c["id"]]
                        idx = 1
                        while idx < 64:
                            sym = _read_huff(bits, huff[(1, c["ac_t"])])
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    break
                                idx += 16
                                continue
                            idx += run
                            zz[idx] = _signed(bits.take(size), size)
                            idx += 1
                        # dequantize into natural order, then idct
                        q = quant[c["q"]]
                        nat = [0] * 64
                        for zi, (r, cc) in enumerate(_ZZ_ROWCOL):
                            nat[r * 8 + cc] = zz[zi] * q[r * 8 + cc]
                        px = _idct_block(nat)
                        oy = (mr * c["vs"] + vy) * 8
                        ox = (mc * c["hs"] + vx) * 8
                        for y in range(8):
                            row = c["plane"][oy + y]
                            row[ox : ox + 8] = px[y]
            mcu_index += 1
    if mcu_index < total_mcus:
        raise ValueError("twin: truncated scan")

    if len(comps) == 1:
        return [
            [[comps[0]["plane"][y][x]] for x in range(width)] for y in range(height)
        ]

    out = []
    for y in range(height):
        row = []
        for x in range(width):
            samples = []
            for c in comps:
                sy = (y * c["vs"]) // vs_max
                sx = (x * c["hs"]) // hs_max
                samples.append(c["plane"][sy][sx])
            yv, cb, cr = samples
            r = yv + ((_R_CR * (cr - 128) + 32768) >> 16)
            g = yv - ((_G_CB * (cb - 128) + _G_CR * (cr - 128) + 32768) >> 16)
            b = yv + ((_B_CB * (cb - 128) + 32768) >> 16)
            row.append([max(0, min(255, v)) for v in (r, g, b)])
        out.append(row)
    return out
