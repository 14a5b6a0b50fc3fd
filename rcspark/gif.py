"""Real GIF codec — stdlib + numpy, no external imaging library.

Closes (for GIF) the last common ImagesPipeline interchange format:
[U scrapy/pipelines/images.py] `convert_image` explicitly accepts GIF
uploads and re-encodes them to JPEG for storage, so a crawl frontier that
ingests the public web sees GIF constantly. Scope is the full still +
animation subset a crawler meets:

- decode: GIF87a and GIF89a, global AND per-frame local color tables,
  variable-width LZW (clear/EOI, code-width growth, 4096-entry reset),
  the 4-pass interlace row order, Graphic Control Extension transparency,
  and frame compositing under disposal methods 0/1 (leave), 2 (restore to
  background) and 3 (restore to previous);
- encode: single- or multi-frame GIF89a with deterministic bytes — an
  exact sorted palette when the image has ≤256 distinct colors (lossless
  roundtrip), else a fixed 3-3-2 uniform palette (deterministic
  quantization, `quantize_332` is the exact contract both engines can
  restate); real variable-width LZW compression, optional interlacing.

Correctness evidence without PIL in the sandbox (tests/test_codecs.py):
exact roundtrip on ≤256-color images, decode(encode(x)) == quantize_332(x)
on truecolor images, interlaced == non-interlaced decode, animation
disposal compositing, and bit-equality against the INDEPENDENT scalar
spec-forward decoder in scripts/gif_twin.py (bit-by-bit LZW, its own
interlace map and compositor) over every fixture. Hostile input raises
ValueError, never corrupts.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAX_CODE = 4096  # LZW dictionary ceiling fixed by the GIF spec

# hostile-input decode budgets: a GIF is tiny relative to its decoded
# size (a 12-byte frame block forces a full-canvas composite copy), so
# both the frame count and the TOTAL composited pixels are capped —
# without this a ~KB file amplifies into terabytes of canvas copies.
GIF_MAX_FRAMES = 1024
GIF_MAX_TOTAL_PIXELS = 1 << 27  # Σ over frames of canvas w*h

# interlace passes: (row offset, row step) in pass order (GIF89a App. E)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def quantize_332(pix: np.ndarray) -> np.ndarray:
    """Deterministic 3-3-2 uniform quantization (the truecolor-encode
    contract): channel value -> level -> mid-range reconstruction
    r,g: (v>>5) of 8 levels -> (lvl*255+3)//7 ; b: (v>>6) of 4 -> lvl*85."""
    r = ((pix[:, :, 0].astype(np.int64) >> 5) * 255 + 3) // 7
    g = ((pix[:, :, 1].astype(np.int64) >> 5) * 255 + 3) // 7
    b = (pix[:, :, 2].astype(np.int64) >> 6) * 85
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _palette_332() -> np.ndarray:
    """The fixed 256-entry 3-3-2 palette matching quantize_332."""
    idx = np.arange(256, dtype=np.int64)
    r = ((idx >> 5) * 255 + 3) // 7
    g = (((idx >> 2) & 7) * 255 + 3) // 7
    b = (idx & 3) * 85
    return np.stack([r, g, b], axis=1).astype(np.uint8)


def _indices_332(pix: np.ndarray) -> np.ndarray:
    p = pix.astype(np.uint16)
    return (
        ((p[:, :, 0] >> 5) << 5) | ((p[:, :, 1] >> 5) << 2) | (p[:, :, 2] >> 6)
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width, CLEAR/EOI)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        if next_code < GIF_MAX_CODE:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Variable-width LZW decode of `data` into exactly n_expected indices.

    Prefix/suffix-array formulation (the twin uses the dict-of-bytestrings
    formulation — intentionally different structure)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # prefix link + final byte per code; roots are their own byte
    prefix = np.full(GIF_MAX_CODE, -1, dtype=np.int32)
    suffix = np.zeros(GIF_MAX_CODE, dtype=np.uint8)
    suffix[:clear] = np.arange(clear, dtype=np.uint8)
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    next_code = eoi + 1
    prev = -1
    stack = bytearray()
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("first LZW code is not a literal")
            out.append(code)
            prev = code
            continue
        if code > next_code or (code == next_code and next_code >= GIF_MAX_CODE):
            raise ValueError("LZW code beyond dictionary")
        # expand `code` (or prev+first(prev) for the code==next_code case)
        stack.clear()
        c = prev if code == next_code else code
        while c >= 0:
            stack.append(int(suffix[c]))
            c = int(prefix[c])
        first = stack[-1]
        seq = stack[::-1]
        if code == next_code:
            seq = seq + bytes([first])
        out.extend(seq)
        if next_code < GIF_MAX_CODE:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if len(out) < n_expected:
        raise ValueError(f"LZW underrun: {len(out)} of {n_expected} pixels")
    return bytes(out[:n_expected])


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _deinterlace_rows(h: int) -> np.ndarray:
    """storage-order -> display-row mapping for the 4 interlace passes."""
    rows = []
    for off, step in _INTERLACE_PASSES:
        rows.extend(range(off, h, step))
    return np.asarray(rows, dtype=np.int64)


def _build_palette(pix: np.ndarray) -> tuple[np.ndarray, np.ndarray, str]:
    """-> (palette (n,3) uint8, indices (h,w) uint8, mode) — exact sorted
    palette when ≤256 distinct colors, else the fixed 3-3-2 palette."""
    h, w, _ = pix.shape
    packed = (
        pix[:, :, 0].astype(np.int64) << 16
    ) | (pix[:, :, 1].astype(np.int64) << 8) | pix[:, :, 2].astype(np.int64)
    colors, inv = np.unique(packed, return_inverse=True)
    if len(colors) <= 256:
        pal = np.stack(
            [(colors >> 16) & 255, (colors >> 8) & 255, colors & 255], axis=1
        ).astype(np.uint8)
        return pal, inv.reshape(h, w).astype(np.uint8), "exact"
    return _palette_332(), _indices_332(pix), "p332"


def encode_gif(
    pixels: np.ndarray, interlace: bool = False
) -> tuple[bytes, str]:
    """(h, w, 3) uint8 -> (GIF89a bytes, palette mode 'exact'|'p332').

    Deterministic: exact palettes are sorted by packed RGB; LZW output is a
    pure function of the index stream. 'exact' roundtrips losslessly;
    'p332' roundtrips to quantize_332(pixels) exactly."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    return encode_gif_frames([pixels], interlace=interlace)


def encode_gif_frames(
    frames: list[np.ndarray],
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    disposal: int = 1,
) -> tuple[bytes, str]:
    """Multi-frame GIF89a encoder (full-frame replace per frame).

    The palette is built over ALL frames' colors (exact if their union is
    ≤256 distinct, else fixed 3-3-2) so one global color table serves every
    frame — matching the single-frame contract per frame."""
    if not frames:
        raise ValueError("no frames")
    if delays_cs is not None and len(delays_cs) != len(frames):
        raise ValueError(
            f"delays_cs has {len(delays_cs)} entries for {len(frames)} frames"
        )
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be (h, w, 3) uint8 of equal size")
    stack = np.concatenate(frames, axis=0)
    pal, all_idx, mode = _build_palette(stack)
    table_bits = max(1, int(len(pal) - 1).bit_length())
    table_size = 1 << table_bits
    gct = np.zeros((table_size, 3), dtype=np.uint8)
    gct[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (7 << 4) | (table_bits - 1))  # GCT flag, color res 7
    out += b"\x00\x00"  # background index, aspect
    out += gct.tobytes()
    if len(frames) > 1:
        # Netscape 2.0 looping extension (loop forever)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, table_bits)
    for i, _f in enumerate(frames):
        idx = all_idx[i * h : (i + 1) * h]
        if len(frames) > 1 or delays_cs:
            delay = delays_cs[i] if delays_cs else 0
            out += b"\x21\xf9\x04"
            out.append((disposal & 7) << 2)  # no transparency
            out += struct.pack("<H", delay)
            out += b"\x00\x00"  # transparent index (unused), terminator
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x40 if interlace else 0x00)  # no LCT
        rows = idx[_deinterlace_rows(h)] if interlace else idx
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(rows.tobytes(), mcs))
    out.append(0x3B)
    return bytes(out), mode


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("GIF truncated")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def byte(self) -> int:
        return self.take(1)[0]

    def blocks(self) -> bytes:
        out = bytearray()
        while True:
            n = self.byte()
            if n == 0:
                return bytes(out)
            out += self.take(n)


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of composited (h, w, 3) uint8 canvases (one per
    frame), honoring local color tables, interlace, GCE transparency and
    disposal methods 0-3. Raises ValueError on structural violations."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    r = _Reader(data)
    r.take(6)
    w, h = struct.unpack("<HH", r.take(4))
    flags = r.byte()
    bg_index = r.byte()
    r.byte()  # aspect
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(r.take(3 * n), dtype=np.uint8).reshape(n, 3)
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError(f"bad logical screen {w}x{h}")
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    bg_fill = canvas[0, 0].copy() if h and w else np.zeros(3, np.uint8)
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while True:
        sep = r.byte()
        if sep == 0x3B:  # trailer
            break
        if sep == 0x21:  # extension
            label = r.byte()
            payload = r.blocks()
            if label == 0xF9 and len(payload) >= 4:
                disposal = (payload[0] >> 2) & 7
                transparent = payload[3] if payload[0] & 1 else -1
            continue
        if sep != 0x2C:
            raise ValueError(f"unexpected block 0x{sep:02x}")
        if len(frames) >= GIF_MAX_FRAMES:
            raise ValueError(f"more than {GIF_MAX_FRAMES} frames")
        if (len(frames) + 1) * h * w > GIF_MAX_TOTAL_PIXELS:
            raise ValueError("decoded size exceeds GIF_MAX_TOTAL_PIXELS budget")
        left, top, fw, fh = struct.unpack("<HHHH", r.take(8))
        if fw == 0 or fh == 0:
            raise ValueError("zero-area frame")
        iflags = r.byte()
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            table = np.frombuffer(r.take(3 * n), dtype=np.uint8).reshape(n, 3)
        if table is None:
            raise ValueError("frame has no color table")
        if left + fw > w or top + fh > h:
            raise ValueError("frame exceeds logical screen")
        mcs = r.byte()
        raw = _lzw_decode(r.blocks(), mcs, fw * fh)
        idx = np.frombuffer(raw, dtype=np.uint8).reshape(fh, fw)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("pixel index beyond color table")
        if iflags & 0x40:
            disp = np.empty_like(idx)
            disp[_deinterlace_rows(fh)] = idx
            idx = disp
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        rgb = table[idx]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_fill
        elif disposal == 3 and saved is not None:
            canvas = saved
        disposal = 0
        transparent = -1
    if not frames:
        raise ValueError("GIF has no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> first composited frame as (h, w, 3) uint8."""
    return decode_gif_frames(data)[0]
