"""Independent scalar GIF decoder — the spec-forward twin for rcspark/gif.py.

Deliberately DIFFERENT structure from the engine decoder so a shared bug
cannot hide: bit-by-bit LSB-first code assembly (the engine batches whole
bytes into an accumulator), dict-of-bytestrings LZW (the engine uses
prefix/suffix link arrays), a pass-by-pass interlace writer (the engine
uses one precomputed row-permutation), and a per-pixel compositor (the
engine uses numpy masking). Pure Python ints + lists; numpy only to hand
the result back.

Used by tests/test_codecs.py (bit-equality over every fixture) and
scripts/gen_media_expected.py (expected parquet for the driver's DuckDB
oracle on the GIF queries).
"""

from __future__ import annotations

import struct


class _Bits:
    """LSB-first bit cursor over the concatenated image sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i, off = divmod(self.bit, 8)
            if byte_i >= len(self.data):
                raise ValueError("twin: LZW bits exhausted")
            v |= ((self.data[byte_i] >> off) & 1) << i
            self.bit += 1
        return v


def _twin_lzw(data: bytes, mcs: int, n: int) -> list[int]:
    clear = 1 << mcs
    eoi = clear + 1
    bits = _Bits(data)
    book: dict[int, bytes] = {}

    def reset() -> int:
        book.clear()
        for i in range(clear):
            book[i] = bytes([i])
        return mcs + 1

    width = reset()
    out: list[int] = []
    prev: bytes | None = None
    while len(out) < n:
        code = bits.read(width)
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in book:
                raise ValueError("twin: first code not a literal")
            entry = book[code]
        elif code in book:
            entry = book[code]
        elif code == len(book) + 2:  # next free slot: the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("twin: bad LZW code")
        out.extend(entry)
        if prev is not None and len(book) + 2 < 4096:
            book[len(book) + 2] = prev + entry[:1]
            if len(book) + 2 == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n:
        raise ValueError("twin: LZW underrun")
    return out[:n]


_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def twin_decode_gif_frames(data: bytes) -> list[list[list[tuple[int, int, int]]]]:
    """GIF bytes -> list of frames, each a list of rows of (r, g, b)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("twin: not a GIF")
    pos = 6
    w, h = struct.unpack("<HH", data[pos : pos + 4])
    pos += 4
    flags, bg = data[pos], data[pos + 1]
    pos += 3
    gct = None
    if flags & 0x80:
        ncol = 2 << (flags & 7)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(ncol)]
        pos += 3 * ncol
    bg_rgb = gct[bg] if gct and bg < len(gct) else (0, 0, 0)
    canvas = [[bg_rgb for _ in range(w)] for _ in range(h)]
    frames: list[list[list[tuple[int, int, int]]]] = []
    transparent = -1
    disposal = 0
    while pos < len(data):
        sep = data[pos]
        pos += 1
        if sep == 0x3B:
            break
        if sep == 0x21:
            label = data[pos]
            pos += 1
            payload = bytearray()
            while data[pos]:
                ln = data[pos]
                payload += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and len(payload) >= 4:
                disposal = (payload[0] >> 2) & 7
                transparent = payload[3] if payload[0] & 1 else -1
            continue
        if sep != 0x2C:
            raise ValueError(f"twin: unexpected block 0x{sep:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        pos += 8
        iflags = data[pos]
        pos += 1
        table = gct
        if iflags & 0x80:
            ncol = 2 << (iflags & 7)
            table = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(ncol)]
            pos += 3 * ncol
        if table is None:
            raise ValueError("twin: no color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _twin_lzw(bytes(lzw), mcs, fw * fh)
        # storage rows -> display rows
        grid = [idx[r * fw : (r + 1) * fw] for r in range(fh)]
        if iflags & 0x40:
            ordered: list[list[int] | None] = [None] * fh
            src = 0
            for off, step in _PASSES:
                for y in range(off, fh, step):
                    ordered[y] = grid[src]
                    src += 1
            grid = [row for row in ordered if row is not None]
        saved = [row[:] for row in canvas] if disposal == 3 else None
        for y in range(fh):
            for x in range(fw):
                v = grid[y][x]
                if v == transparent:
                    continue
                if v >= len(table):
                    raise ValueError("twin: index beyond palette")
                canvas[top + y][left + x] = table[v]
        frames.append([row[:] for row in canvas])
        if disposal == 2:
            for y in range(fh):
                for x in range(fw):
                    canvas[top + y][left + x] = bg_rgb
        elif disposal == 3 and saved is not None:
            canvas = saved
        disposal = 0
        transparent = -1
    if not frames:
        raise ValueError("twin: no frames")
    return frames


def twin_decode_gif(data: bytes) -> list[list[tuple[int, int, int]]]:
    return twin_decode_gif_frames(data)[0]


def twin_quantize_332(r: int, g: int, b: int) -> tuple[int, int, int]:
    """Scalar restatement of the 3-3-2 quantization contract."""
    return (((r >> 5) * 255 + 3) // 7, ((g >> 5) * 255 + 3) // 7, (b >> 6) * 85)
