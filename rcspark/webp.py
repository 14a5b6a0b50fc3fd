"""Real WebP (VP8L lossless) codec — stdlib + numpy, no external imaging
library.

Closes the WebP half of the A16 codec seam ([U scrapy/pipelines/images.py]
stores thumbnails through an interchange codec; round 3 closed PNG, round 4
closed JPEG — this module closes WebP lossless). The format implemented is
the public "WebP Lossless Bitstream Specification" (RFC 9649 §3-5 /
libwebp's VP8L): RIFF container, LSB-first bit packing, canonical prefix
codes (simple and normal form, incl. the max-symbol early-stop and the
16/17/18 code-length repeats), color cache, LZ77 backward references with
the 120-entry 2D distance map, meta prefix groups, and all four transforms
(predictor, cross-color, subtract-green, color-indexing with sub-byte
index bundling).

Decoder scope (general VP8L, not just what our encoder emits):

- both prefix-code forms; single-symbol codes cost 0 bits;
- color cache of 1..11 bits (hash ``(0x1e35a7bd * argb) >> (32 - bits)``);
- LZ77 lengths/distances via the shared 24/40-symbol prefix-value bins;
  distance plane-codes <= 120 map through DIST_MAP (below);
- meta prefix groups via an entropy-coded group image ((r << 8) | g);
- transforms inverted in reverse bitstream order, each sized by the
  image width in effect when it was read.

Encoder scope (deterministic bytes — no RNG, fixed tie-breaks — so corpus
digests are stable across runs): modes ``palette`` (color-indexing, packed
indices for <= 16 colors), ``subtract_green``, ``predictor`` (per-16x16-
block best-of-14, vectorized cost), ``color_transform`` (per-block
multipliers from a fixed candidate grid), ``literal``; greedy LZ77 over a
position hash-chain plus an optional color cache; canonical Huffman with
deterministic ties and a Kraft-exact 15-bit length clamp; optional
``two_groups`` meta-prefix split (exercises the decoder's group path).

Determinism / twin contract (the png.py / jpeg.py pattern): the decode
arithmetic is exact uint8/int8 integer end to end, so any two
implementations produce bit-identical pixels. scripts/webp_twin.py is an
independently-written scalar spec-forward decoder (tree-walk prefix
decode, per-pixel transform inverses); tests/test_codecs.py pins both
decoders equal on every fixture encoding.

Contract choices T.81-style notes (spec realizations the twin must share):

- DIST_MAP is GENERATED, not transcribed: the spec's 120 (dx, dy) pairs
  over dy in 0..7, dx in -7..8 (dy > 0 or dx > 0), sorted by
  (dx^2 + dy^2, |dx|, dx < 0) — positive dx before negative at equal
  magnitude. Verified against the published table's leading entries.
- Select (predictor 11) returns T when sum|P-T| <= sum|P-L| (P = L+T-TL
  per channel), i.e. ties go to T (libwebp's ``pa_minus_pb <= 0``).
- ClampAddSubtractHalf divides (a - b) by 2 truncating toward zero.
- The top-right neighbor of a rightmost-column pixel is the leftmost
  pixel of the SAME row (the contiguous-buffer rule).

Lossy WebP (VP8) remains a documented external seam: `decode_webp`
raises NotImplementedError for "VP8 "/"VP8X" chunks — on a real cluster
that binds to PIL/cv2 inside the same vectorized UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O — VP8L packs bits LSB-first within each byte
# ---------------------------------------------------------------------------


class BitReader:
    """LSB-first bit reader over immutable bytes (whole-buffer int; VP8L
    payloads here are small, and int shifts beat per-byte indexing)."""

    def __init__(self, data: bytes):
        self._val = int.from_bytes(data, "little")
        self._nbits = 8 * len(data)
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > self._nbits:
            raise ValueError("VP8L: bitstream truncated")
        v = (self._val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return v


class BitWriter:
    """LSB-first bit writer — flushes whole bytes eagerly so each write is
    O(1) (a single growing int would make the stream O(n^2))."""

    def __init__(self):
        self._buf = bytearray()
        self._acc = 0
        self._nacc = 0

    def write(self, value: int, n: int) -> None:
        assert 0 <= value < (1 << n), (value, n)
        self._acc |= value << self._nacc
        self._nacc += n
        while self._nacc >= 8:
            self._buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nacc -= 8

    def getvalue(self) -> bytes:
        out = bytes(self._buf)
        if self._nacc:
            out += bytes((self._acc,))
        return out


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Code lengths -> {symbol: (length, code)}; canonical (DEFLATE-style)
    assignment: codes ordered by (length, symbol), bits read MSB-of-code
    first. Shared by encoder and decoder table construction."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        out[s] = (l, code)
        code += 1
        prev_len = l
    return out


class PrefixDecoder:
    """Decode side of a canonical code: walk bits MSB-of-code-first via a
    {(nbits, acc): symbol} dict. A code with exactly one used symbol costs
    0 bits (the spec's single-symbol special case)."""

    def __init__(self, lengths: list[int]):
        used = [s for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            self.single: int | None = used[0]
            self.table: dict[tuple[int, int], int] = {}
            self.max_len = 0
            return
        self.single = None
        codes = canonical_codes(lengths)
        # completeness (Kraft == 1) — incomplete codes are bitstream errors
        kraft = sum(1 << (15 - l) for l, _ in codes.values())
        if kraft != 1 << 15:
            raise ValueError("VP8L: incomplete prefix code")
        self.table = {(l, c): s for s, (l, c) in codes.items()}
        self.max_len = max(l for l, _ in codes.values())

    def next(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        for n in range(1, self.max_len + 1):
            acc = (acc << 1) | br.read(1)
            sym = self.table.get((n, acc))
            if sym is not None:
                return sym
        raise ValueError("VP8L: bad prefix code word")


def huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Deterministic Huffman code lengths (heap merge with stable
    (weight, first-symbol) ties) clamped to max_len with an exact-Kraft
    repair, so PrefixDecoder always accepts the result."""
    import heapq

    sym = [i for i, f in enumerate(freqs) if f > 0]
    lengths = [0] * len(freqs)
    if not sym:
        return lengths
    if len(sym) == 1:
        lengths[sym[0]] = 1
        return lengths
    heap = [(freqs[s], s, (s,)) for s in sym]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, o1, g1 = heapq.heappop(heap)
        f2, o2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, min(o1, o2), g1 + g2))
    if max(lengths[s] for s in sym) > max_len:
        for s in sym:
            lengths[s] = min(lengths[s], max_len)
        unit = 1 << max_len  # Kraft sum in units of 2^-max_len
        kraft = sum(1 << (max_len - lengths[s]) for s in sym)
        while kraft > unit:  # over-full: lengthen the deepest length < max
            cand = [s for s in sym if lengths[s] < max_len]
            s = max(cand, key=lambda s: (lengths[s], -s))
            kraft -= 1 << (max_len - lengths[s])
            lengths[s] += 1
            kraft += 1 << (max_len - lengths[s])
        while kraft < unit:  # under-full: shorten the deepest that fits
            for s in sorted(sym, key=lambda s: (-lengths[s], s)):
                gain = 1 << (max_len - lengths[s])  # doubling its share
                if kraft + gain <= unit and lengths[s] > 1:
                    lengths[s] -= 1
                    kraft += gain
                    break
            else:  # pragma: no cover - unreachable: a leaf can always split
                raise AssertionError("Kraft repair failed")
    return lengths


# ---------------------------------------------------------------------------
# LZ77 prefix-value bins and the 2D distance map
# ---------------------------------------------------------------------------


def _make_bins(n_codes: int) -> list[tuple[int, int, int]]:
    """(code, offset, extra_bits): prefix-coded value v has v-1 in
    [offset, offset + 2^extra_bits)."""
    bins = []
    for code in range(n_codes):
        if code < 4:
            bins.append((code, code, 0))
        else:
            eb = (code - 2) >> 1
            bins.append((code, (2 + (code & 1)) << eb, eb))
    return bins


LEN_BINS = _make_bins(24)
DIST_BINS = _make_bins(40)


def _bin_decode(br: BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    eb = (code - 2) >> 1
    return (((2 + (code & 1)) << eb) + br.read(eb)) + 1


def _bin_encode(v: int, bins: list[tuple[int, int, int]]) -> tuple[int, int, int]:
    """value -> (code, extra_value, extra_bits)."""
    x = v - 1
    for code, off, eb in bins:
        if off <= x < off + (1 << eb):
            return code, x - off, eb
    raise ValueError(f"value {v} out of prefix-bin range")


def _make_dist_map() -> list[tuple[int, int]]:
    cand = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(cand) == 120
    return cand


DIST_MAP = _make_dist_map()
_DIST_INV = {p: i + 1 for i, p in enumerate(DIST_MAP)}


def plane_code_to_dist(xsize: int, plane: int) -> int:
    if plane > 120:
        return plane - 120
    dx, dy = DIST_MAP[plane - 1]
    return max(1, dy * xsize + dx)


def dist_to_plane_code(xsize: int, dist: int) -> int:
    dy, dx = divmod(dist, xsize)
    for cdx, cdy in ((dx, dy), (dx - xsize, dy + 1)):
        p = _DIST_INV.get((cdx, cdy))
        if p is not None and plane_code_to_dist(xsize, p) == dist:
            return p
    return dist + 120


# ---------------------------------------------------------------------------
# color cache
# ---------------------------------------------------------------------------

_HASH_MUL = 0x1E35A7BD


def cache_hash(argb: int, bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_code_lengths(br: BitReader, alphabet: int) -> list[int]:
    """Normal-form prefix code: code-length code, then RLE'd lengths
    (16 = repeat prev nonzero, 17/18 = zero runs), with the optional
    max-symbol early stop."""
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = PrefixDecoder(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_dec.next(br)
        if cl < 16:
            lengths[i] = cl
            i += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            for _ in range(repeat):
                if i >= alphabet:
                    break
                lengths[i] = fill
                i += 1
    return lengths


def _read_prefix_code(br: BitReader, alphabet: int) -> PrefixDecoder:
    if br.read(1):  # simple form
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet
        if num_symbols == 2:
            s1 = br.read(8)
            if s0 >= alphabet or s1 >= alphabet:
                raise ValueError("VP8L: simple-code symbol out of alphabet")
            lengths[s0] = lengths[s1] = 1
        else:
            if s0 >= alphabet:
                raise ValueError("VP8L: simple-code symbol out of alphabet")
            lengths[s0] = 1
        return PrefixDecoder(lengths)
    return PrefixDecoder(_read_code_lengths(br, alphabet))


def _read_entropy_image(br: BitReader, w: int, h: int, allow_meta: bool) -> list[int]:
    """One spatially-coded ARGB image -> flat uint32 list (row-major)."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("VP8L: bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    group_of = None
    num_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _read_entropy_image(br, mw, mh, False)
        groups = [((p >> 8) & 0xFFFF) for p in meta]
        num_groups = max(groups) + 1

        def group_of(x, y):
            return groups[(y >> meta_bits) * mw + (x >> meta_bits)]

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    codes = []
    for _ in range(num_groups):
        codes.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    n = w * h
    out: list[int] = []
    while len(out) < n:
        x, y = len(out) % w, len(out) // w
        g_dec, r_dec, b_dec, a_dec, d_dec = codes[group_of(x, y) if group_of else 0]
        s = g_dec.next(br)
        if s < 256:
            red = r_dec.next(br)
            blue = b_dec.next(br)
            alpha = a_dec.next(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out.append(px)
            if cache is not None:
                cache[cache_hash(px, cache_bits)] = px
        elif s < 280:
            length = _bin_decode(br, s - 256)
            dist = plane_code_to_dist(w, _bin_decode(br, d_dec.next(br)))
            if dist > len(out) or len(out) + length > n:
                raise ValueError("VP8L: bad backward reference")
            for _ in range(length):
                px = out[-dist]
                out.append(px)
                if cache is not None:
                    cache[cache_hash(px, cache_bits)] = px
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without cache")
            out.append(cache[s - 280])
    return out


# -- inverse transforms ------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int16) + b.astype(np.int16)) // 2


def _trunc_half(d: np.ndarray) -> np.ndarray:
    return np.where(d >= 0, d // 2, -((-d) // 2))


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict_px(mode, L, T, TL, TR):
    """One pixel's predictor on (a, r, g, b) int tuples."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple((((L[c] + TR[c]) >> 1) + T[c]) >> 1 for c in range(4))
    if mode == 6:
        return tuple((L[c] + TL[c]) >> 1 for c in range(4))
    if mode == 7:
        return tuple((L[c] + T[c]) >> 1 for c in range(4))
    if mode == 8:
        return tuple((TL[c] + T[c]) >> 1 for c in range(4))
    if mode == 9:
        return tuple((T[c] + TR[c]) >> 1 for c in range(4))
    if mode == 10:
        return tuple(
            (((L[c] + TL[c]) >> 1) + ((T[c] + TR[c]) >> 1)) >> 1 for c in range(4)
        )
    if mode == 11:
        pt = pl = 0
        for c in range(4):
            est = L[c] + T[c] - TL[c]
            pt += abs(est - T[c])
            pl += abs(est - L[c])
        return T if pt <= pl else L
    if mode == 12:
        return tuple(_clip255(L[c] + T[c] - TL[c]) for c in range(4))
    if mode == 13:
        out = []
        for c in range(4):
            m = (L[c] + T[c]) >> 1
            d = m - TL[c]
            half = d // 2 if d >= 0 else -((-d) // 2)  # trunc toward zero
            out.append(_clip255(m + half))
        return tuple(out)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(img: np.ndarray, modes: list[int], bits: int, mw: int) -> np.ndarray:
    """img: (h, w, 4) uint8 [a,r,g,b] residuals -> pixels (sequential per
    spec; plain-int tuples — per-pixel numpy ops are ~10x slower here)."""
    h, w, _ = img.shape
    res = img.tolist()
    out: list[list[tuple]] = [[None] * w for _ in range(h)]
    for y in range(h):
        orow = out[y]
        rrow = res[y]
        prow = out[y - 1] if y > 0 else None
        for x in range(w):
            if y == 0:
                pred = (255, 0, 0, 0) if x == 0 else orow[x - 1]
            elif x == 0:
                pred = prow[0]
            else:
                mode = modes[(y >> bits) * mw + (x >> bits)]
                if mode == 1:
                    pred = orow[x - 1]
                elif mode == 2:
                    pred = prow[x]
                else:
                    TR = prow[x + 1] if x + 1 < w else orow[0]
                    pred = _predict_px(mode, orow[x - 1], prow[x], prow[x - 1], TR)
            r0 = rrow[x]
            orow[x] = (
                (r0[0] + pred[0]) & 0xFF,
                (r0[1] + pred[1]) & 0xFF,
                (r0[2] + pred[2]) & 0xFF,
                (r0[3] + pred[3]) & 0xFF,
            )
    return np.array(out, dtype=np.uint8)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta on raw bytes: (int8(t) * int8(c)) >> 5."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(
    img: np.ndarray, elems: list[int], bits: int, mw: int
) -> np.ndarray:
    h, w, _ = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            e = elems[(y >> bits) * mw + (x >> bits)]
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            a, r, g, b = (int(v) for v in img[y, x])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x] = (a, r, g, b)
    return out


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    out = img.astype(np.int16)
    out[:, :, 1] = (out[:, :, 1] + out[:, :, 2]) & 0xFF
    out[:, :, 3] = (out[:, :, 3] + out[:, :, 2]) & 0xFF
    return out.astype(np.uint8)


def _inv_color_indexing(
    img: np.ndarray, palette: list[int], w_full: int
) -> np.ndarray:
    h = img.shape[0]
    n_colors = len(palette)
    if n_colors <= 2:
        ibits = 3
    elif n_colors <= 4:
        ibits = 2
    elif n_colors <= 16:
        ibits = 1
    else:
        ibits = 0
    per = 1 << ibits  # indices bundled per packed pixel
    bpp = 8 >> ibits
    pal = np.array(
        [[(p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF] for p in palette],
        dtype=np.uint8,
    )
    out = np.zeros((h, w_full, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(w_full):
            packed = int(img[y, x // per, 2])  # green channel
            idx = (packed >> ((x % per) * bpp)) & ((1 << bpp) - 1)
            if idx >= n_colors:
                idx = 0  # out-of-range indices decode as entry 0 (libwebp)
            out[y, x] = pal[idx]
    return out


def _flat_to_img(flat: list[int], w: int, h: int) -> np.ndarray:
    """uint32 ARGB list -> (h, w, 4) uint8 [a, r, g, b]."""
    arr = np.array(flat, dtype=np.uint32).reshape(h, w)
    return np.stack(
        [
            (arr >> 24).astype(np.uint8),
            ((arr >> 16) & 0xFF).astype(np.uint8),
            ((arr >> 8) & 0xFF).astype(np.uint8),
            (arr & 0xFF).astype(np.uint8),
        ],
        axis=-1,
    )


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")

    transforms = []  # (type, data...) in read order
    seen = set()
    w_cur = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            bits = br.read(3) + 2
            mw = (w_cur + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _read_entropy_image(br, mw, mh, False)
            if ttype == 0:
                modes = [(p >> 8) & 0xFF for p in sub]
                transforms.append(("pred", modes, bits, mw))
            else:
                elems = [p & 0xFFFFFF for p in sub]
                transforms.append(("color", elems, bits, mw))
        elif ttype == 2:
            transforms.append(("subgreen",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            raw = _read_entropy_image(br, n_colors, 1, False)
            palette = []
            prev = 0
            for p in raw:  # component-wise delta from previous entry
                cur = 0
                for shift in (0, 8, 16, 24):
                    comp = (((p >> shift) & 0xFF) + ((prev >> shift) & 0xFF)) & 0xFF
                    cur |= comp << shift
                palette.append(cur)
                prev = cur
            if n_colors <= 2:
                per = 8
            elif n_colors <= 4:
                per = 4
            elif n_colors <= 16:
                per = 2
            else:
                per = 1
            transforms.append(("index", palette, w_cur))
            w_cur = (w_cur + per - 1) // per

    flat = _read_entropy_image(br, w_cur, h, True)
    img = _flat_to_img(flat, w_cur, h)

    for t in reversed(transforms):
        if t[0] == "index":
            img = _inv_color_indexing(img, t[1], t[2])
        elif t[0] == "subgreen":
            img = _inv_subtract_green(img)
        elif t[0] == "pred":
            img = _inv_predictor(img, t[1], t[2], t[3])
        else:
            img = _inv_color_transform(img, t[1], t[2], t[3])

    return img[:, :, [1, 2, 3, 0]]  # [a,r,g,b] -> RGBA


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 4) uint8 RGBA. VP8L (lossless) only; lossy VP8
    and extended VP8X raise NotImplementedError (external-codec seam)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"VP8L":
            return decode_vp8l(data[pos + 8 : pos + 8 + size])
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP: binds to PIL/cv2 on a real cluster"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no VP8L chunk")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _write_prefix_code(bw: BitWriter, lengths: list[int]) -> None:
    """Emit one prefix code: simple form when the used symbols fit it,
    else normal form (code-length code + 17/18 zero-run RLE, use_max=0)."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    assert used, "cannot emit an empty prefix code"
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if used[0] <= 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        return
    if len(used) == 2 and used[1] < 256 and lengths[used[0]] == 1 and lengths[used[1]] == 1:
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        if used[0] <= 1:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        bw.write(used[1], 8)
        return

    bw.write(0, 1)  # normal form
    # RLE the length array: literals 0..15 plus 17/18 zero runs
    rle: list[tuple[int, int]] = []  # (cl_symbol, extra)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                rle.append((18, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                rle.append((17, r - 3))
                run -= r
            for _ in range(run):
                rle.append((0, -1))
            i = j
        else:
            rle.append((lengths[i], -1))
            i += 1
    cl_freq = [0] * 19
    for cl, _ in rle:
        cl_freq[cl] += 1
    cl_lengths = huffman_lengths(cl_freq, max_len=7)
    # single used code-length symbol: canonical_codes gives it length 1;
    # the decoder's PrefixDecoder treats single-symbol as 0 bits, so keep
    # the emitted length array consistent (length 1 is what we declare and
    # the reader's PrefixDecoder(single) never consumes data bits).
    num_cl = max(i for i, s in enumerate(_CL_ORDER) if cl_lengths[s] > 0) + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # use_max = 0: lengths cover the whole alphabet
    cl_codes = canonical_codes(cl_lengths)
    cl_single = sum(1 for l in cl_lengths if l > 0) == 1
    for cl, extra in rle:
        if not cl_single:
            l, c = cl_codes[cl]
            bw.write(int(f"{c:0{l}b}"[::-1], 2), l)  # MSB-of-code first
        if cl == 17:
            bw.write(extra, 3)
        elif cl == 18:
            bw.write(extra, 7)


def _emit_table(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (nbits, reversed_code)} ready for the LSB-first writer
    (canonical code bits are consumed MSB-first by the reader). A code
    with a single used symbol costs 0 bits."""
    codes = canonical_codes(lengths)
    if len(codes) == 1:
        return {s: (0, 0) for s in codes}
    out = {}
    for s, (l, c) in codes.items():
        rev = 0
        cc = c
        for _ in range(l):
            rev = (rev << 1) | (cc & 1)
            cc >>= 1
        out[s] = (l, rev)
    return out


def _symbolize(
    flat: list[int], w: int, cache_bits: int, use_lz77: bool
) -> list[tuple]:
    """Pixel sequence -> token stream, mirroring the decoder's cache/chain
    state. Tokens: ('lit', a, r, g, b) | ('cache', idx) | ('copy', length,
    dist). Greedy LZ77 over a pixel-value hash chain (8 probes)."""
    n = len(flat)
    arr = np.asarray(flat, dtype=np.uint32)
    if cache_bits:
        hs = (
            ((np.uint64(_HASH_MUL) * arr.astype(np.uint64)) & np.uint64(0xFFFFFFFF))
            >> np.uint64(32 - cache_bits)
        ).astype(np.int64).tolist()
        cache = [0] * (1 << cache_bits)
    else:
        hs = None
        cache = None
    if use_lz77:
        # a pixel value that occurs once can never start or feed a match —
        # keep it out of the hash chain entirely (token stream unchanged)
        _, inv, counts = np.unique(arr, return_inverse=True, return_counts=True)
        repeated = (counts[inv] > 1).tolist()
    chain: dict[int, list[int]] = {}
    tokens: list[tuple] = []
    pos = 0
    while pos < n:
        best_len, best_dist = 0, 0
        if use_lz77 and repeated[pos]:
            for prev in reversed(chain.get(flat[pos], [])[-8:]):
                dist = pos - prev
                if dist > 1048576 - 120:
                    break
                l = 0
                cap = min(4096, n - pos)
                while l < cap and flat[prev + l] == flat[pos + l]:
                    l += 1
                if l > best_len:
                    best_len, best_dist = l, dist
        if best_len >= 3:
            tokens.append(("copy", best_len, best_dist))
            end = pos + best_len
            while pos < end:
                if repeated[pos]:
                    chain.setdefault(flat[pos], []).append(pos)
                if cache is not None:
                    cache[hs[pos]] = flat[pos]
                pos += 1
            continue
        px = flat[pos]
        if cache is not None and cache[hs[pos]] == px and pos > 0:
            tokens.append(("cache", hs[pos]))
        else:
            tokens.append(
                ("lit", px >> 24, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)
            )
        if use_lz77 and repeated[pos]:
            chain.setdefault(px, []).append(pos)
        if cache is not None:
            cache[hs[pos]] = px
        pos += 1
    return tokens


def _token_positions(tokens: list[tuple]) -> list[int]:
    """Starting pixel index of each token."""
    out = []
    pos = 0
    for t in tokens:
        out.append(pos)
        pos += t[1] if t[0] == "copy" else 1
    return out


def _write_entropy_image(
    bw: BitWriter,
    flat: list[int],
    w: int,
    h: int,
    cache_bits: int = 0,
    use_lz77: bool = True,
    two_groups: bool = False,
    allow_meta: bool = True,
) -> None:
    """Emit one spatially-coded image. two_groups (top-level only) splits
    the image into left/right meta-prefix groups with independent codes —
    exercises the decoder's group path with a genuinely multi-code file."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)

    tokens = _symbolize(flat, w, cache_bits, use_lz77)
    positions = _token_positions(tokens)

    meta_bits = 0
    group_at = None
    if two_groups and allow_meta and w >= 2:
        meta_bits = max(2, (max(w // 2, 1) - 1).bit_length())
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        # group 1 for blocks in the right half (if any), else single group
        meta_px = [
            (0xFF << 24) | ((1 if (bx << meta_bits) >= w // 2 else 0) << 8)
            for _by in range(mh)
            for bx in range(mw)
        ]
        if any((p >> 8) & 0xFF for p in meta_px):
            bw.write(1, 1)  # has meta prefix
            bw.write(meta_bits - 2, 3)
            _write_entropy_image(bw, meta_px, mw, mh, 0, False, allow_meta=False)

            def group_at(pos: int) -> int:
                x, y = pos % w, pos // w
                mx, my = x >> meta_bits, y >> meta_bits
                return (meta_px[my * mw + mx] >> 8) & 0xFF

        else:
            bw.write(0, 1)
    elif allow_meta:
        bw.write(0, 1)

    n_groups = 2 if group_at else 1
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    freqs = [
        {
            "g": [0] * green_alpha,
            "r": [0] * 256,
            "b": [0] * 256,
            "a": [0] * 256,
            "d": [0] * 40,
        }
        for _ in range(n_groups)
    ]
    for tok, pos in zip(tokens, positions):
        f = freqs[group_at(pos) if group_at else 0]
        if tok[0] == "lit":
            _, a, r, g, b = tok
            f["g"][g] += 1
            f["r"][r] += 1
            f["b"][b] += 1
            f["a"][a] += 1
        elif tok[0] == "cache":
            f["g"][280 + tok[1]] += 1
        else:
            lcode, _, _ = _bin_encode(tok[1], LEN_BINS)
            f["g"][256 + lcode] += 1
            pcode = dist_to_plane_code(w, tok[2])
            dcode, _, _ = _bin_encode(pcode, DIST_BINS)
            f["d"][dcode] += 1

    group_codes = []
    for f in freqs:
        entry = {}
        for k in ("g", "r", "b", "a", "d"):
            fr = list(f[k])
            if not any(fr):
                fr[0] = 1  # unused code: emit a 1-symbol placeholder
            lengths = huffman_lengths(fr)
            _write_prefix_code(bw, lengths)
            entry[k] = _emit_table(lengths)
        group_codes.append(entry)

    write = bw.write
    for tok, pos in zip(tokens, positions):
        cg = group_codes[group_at(pos) if group_at else 0]
        kind = tok[0]
        if kind == "lit":
            _, a, r, g, b = tok
            l1, v = cg["g"][g]
            l2, v2 = cg["r"][r]
            v |= v2 << l1
            l1 += l2
            l2, v2 = cg["b"][b]
            v |= v2 << l1
            l1 += l2
            l2, v2 = cg["a"][a]
            write(v | (v2 << l1), l1 + l2)
        elif kind == "cache":
            l1, v = cg["g"][280 + tok[1]]
            write(v, l1)
        else:
            lcode, lextra, leb = _bin_encode(tok[1], LEN_BINS)
            l1, v = cg["g"][256 + lcode]
            write(v | (lextra << l1), l1 + leb)
            pcode = dist_to_plane_code(w, tok[2])
            dcode, dextra, deb = _bin_encode(pcode, DIST_BINS)
            l1, v = cg["d"][dcode]
            write(v | (dextra << l1), l1 + deb)


# -- forward transforms ------------------------------------------------------


def _neighbors(px: np.ndarray):
    """px (h, w, 4) int16 -> (L, T, TL, TR) neighbor arrays with the spec's
    edge conventions where they matter (row 0 / col 0 are overridden by the
    fixed edge predictors; TR of the last column is the row's first pixel)."""
    h, w, _ = px.shape
    L = np.empty_like(px)
    L[:, 1:] = px[:, :-1]
    L[:, 0] = 0
    T = np.empty_like(px)
    T[1:] = px[:-1]
    T[0] = 0
    TL = np.empty_like(px)
    TL[1:, 1:] = px[:-1, :-1]
    TL[0] = 0
    TL[:, 0] = 0
    TR = np.empty_like(px)
    TR[1:, :-1] = px[:-1, 1:]
    TR[1:, -1] = px[1:, 0]
    TR[0] = 0
    return L, T, TL, TR


def _predict_all(px: np.ndarray) -> list[np.ndarray]:
    """Vectorized predictions P_m (h, w, 4) int16 for modes 0..13, with
    the row-0/col-0/origin overrides already applied to every mode."""
    h, w, _ = px.shape
    L, T, TL, TR = _neighbors(px)
    P = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
    pT = np.abs(P - T).sum(axis=2, keepdims=True)
    pL = np.abs(P - L).sum(axis=2, keepdims=True)
    sel = np.where(pT <= pL, T, L)
    m = _avg2(L, T).astype(np.int32)
    half = np.clip(m + _trunc_half(m - TL.astype(np.int32)), 0, 255)
    preds = [
        np.broadcast_to(
            np.array([255, 0, 0, 0], dtype=np.int16), px.shape
        ).copy(),
        L,
        T,
        TR,
        TL,
        _avg2(_avg2(L, TR), T),
        _avg2(L, TL),
        _avg2(L, T),
        _avg2(TL, T),
        _avg2(T, TR),
        _avg2(_avg2(L, TL), _avg2(T, TR)),
        sel.astype(np.int16),
        np.clip(P, 0, 255).astype(np.int16),
        half.astype(np.int16),
    ]
    out = []
    for p in preds:
        p = p.astype(np.int16).copy()
        if w > 1:
            p[0, 1:] = L[0, 1:]  # row 0: left-predicted
        if h > 1:
            p[1:, 0] = T[1:, 0]  # col 0: top-predicted
        p[0, 0] = np.array([255, 0, 0, 0], dtype=np.int16)
        out.append(p)
    return out


def _wrap_cost(res: np.ndarray) -> np.ndarray:
    """Per-pixel wraparound residual magnitude (residuals cluster near 0
    or 255 when prediction is good)."""
    r = res.astype(np.int32)
    return np.minimum(r, 256 - r).sum(axis=2)


def _forward_predictor(px: np.ndarray, bits: int = 4):
    """-> (modes flat list, mw, mh, residual image uint8)."""
    h, w, _ = px.shape
    preds = _predict_all(px)
    residuals = [((px.astype(np.int16) - p) & 0xFF).astype(np.uint8) for p in preds]
    costs = [_wrap_cost(r) for r in residuals]
    bs = 1 << bits
    mw = (w + bs - 1) >> bits
    mh = (h + bs - 1) >> bits
    modes = []
    out = np.empty_like(px, dtype=np.uint8)
    for by in range(mh):
        for bx in range(mw):
            ys, xs = by << bits, bx << bits
            sl = (slice(ys, min(ys + bs, h)), slice(xs, min(xs + bs, w)))
            best = min(range(14), key=lambda mode: (int(costs[mode][sl].sum()), mode))
            modes.append(best)
            out[sl] = residuals[best][sl]
    return modes, mw, mh, out


def _ct_delta_vec(t: int, c: np.ndarray) -> np.ndarray:
    """Vectorized ColorTransformDelta: t is a raw byte, c an int-like array
    of raw bytes; both reinterpreted as int8."""
    ts = t - 256 if t >= 128 else t
    cs = c.astype(np.int16)
    cs = np.where(cs >= 128, cs - 256, cs)
    return (ts * cs.astype(np.int32)) >> 5


_CT_CANDIDATES = [0, 16, -16, 32, -32, 64, -64, 96, -96]


def _forward_color_transform(px: np.ndarray, bits: int = 4):
    """Per-block (g2r, g2b) from a fixed candidate grid (r2b = 0),
    deterministic min-cost ties to the earlier candidate.
    -> (elems flat list, mw, mh, residual image uint8)."""
    h, w, _ = px.shape
    r = px[:, :, 1].astype(np.int16)
    g = px[:, :, 2]
    b = px[:, :, 3].astype(np.int16)
    bs = 1 << bits
    mw = (w + bs - 1) >> bits
    mh = (h + bs - 1) >> bits
    cand = []
    for g2r in _CT_CANDIDATES:
        tr = g2r & 0xFF
        stored_r = ((r - _ct_delta_vec(tr, g)) & 0xFF).astype(np.int32)
        cost_r = np.minimum(stored_r, 256 - stored_r)
        cand.append((tr, stored_r.astype(np.uint8), cost_r))
    cand_b = []
    for g2b in _CT_CANDIDATES:
        tb = g2b & 0xFF
        stored_b = ((b - _ct_delta_vec(tb, g)) & 0xFF).astype(np.int32)
        cost_b = np.minimum(stored_b, 256 - stored_b)
        cand_b.append((tb, stored_b.astype(np.uint8), cost_b))
    elems = []
    out = px.copy()
    for by in range(mh):
        for bx in range(mw):
            ys, xs = by << bits, bx << bits
            sl = (slice(ys, min(ys + bs, h)), slice(xs, min(xs + bs, w)))
            ir = min(range(len(cand)), key=lambda i: (int(cand[i][2][sl].sum()), i))
            ib = min(range(len(cand_b)), key=lambda i: (int(cand_b[i][2][sl].sum()), i))
            g2r, g2b = cand[ir][0], cand_b[ib][0]
            elems.append((g2b << 8) | g2r)  # r2b = 0
            out[sl + (1,)] = cand[ir][1][sl]
            out[sl + (3,)] = cand_b[ib][1][sl]
    return elems, mw, mh, out


def _img_to_flat(img: np.ndarray) -> list[int]:
    """(h, w, 4) uint8 [a, r, g, b] -> flat uint32 ARGB list."""
    a = img.astype(np.uint32)
    return list(
        ((a[:, :, 0] << 24) | (a[:, :, 1] << 16) | (a[:, :, 2] << 8) | a[:, :, 3])
        .ravel()
    )


def _encode_vp8l(
    px: np.ndarray, mode: str, cache_bits: int, use_lz77: bool, two_groups: bool
) -> bytes:
    """px: (h, w, 4) uint8 [a, r, g, b] -> VP8L chunk payload bytes."""
    h, w, _ = px.shape
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int(bool((px[:, :, 0] != 255).any())), 1)
    bw.write(0, 3)  # version

    main = px
    main_w = w
    if mode == "literal":
        pass
    elif mode == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        out = px.astype(np.int16)
        out[:, :, 1] = (out[:, :, 1] - out[:, :, 2]) & 0xFF
        out[:, :, 3] = (out[:, :, 3] - out[:, :, 2]) & 0xFF
        main = out.astype(np.uint8)
    elif mode == "predictor":
        bits = 4
        modes, mw, mh, main = _forward_predictor(px, bits)
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        mode_px = [(0xFF << 24) | (mo << 8) for mo in modes]
        _write_entropy_image(bw, mode_px, mw, mh, 0, True, allow_meta=False)
    elif mode == "color_transform":
        bits = 4
        elems, mw, mh, main = _forward_color_transform(px, bits)
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        elem_px = [(0xFF << 24) | e for e in elems]
        _write_entropy_image(bw, elem_px, mw, mh, 0, True, allow_meta=False)
    elif mode == "palette":
        flat_px = np.array(_img_to_flat(px), dtype=np.uint32)
        palette = sorted(int(v) for v in np.unique(flat_px))
        n = len(palette)
        if n > 256:
            raise ValueError(f"palette mode needs <= 256 colors, got {n}")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n - 1, 8)
        deltas = []
        prev = 0
        for cur in palette:  # component-wise delta coding
            d = 0
            for shift in (0, 8, 16, 24):
                comp = (((cur >> shift) & 0xFF) - ((prev >> shift) & 0xFF)) & 0xFF
                d |= comp << shift
            deltas.append(d)
            prev = cur
        _write_entropy_image(bw, deltas, n, 1, 0, True, allow_meta=False)
        lut = {c: i for i, c in enumerate(palette)}
        idx = np.array([lut[int(v)] for v in flat_px], dtype=np.uint32).reshape(h, w)
        if n <= 2:
            ibits = 3
        elif n <= 4:
            ibits = 2
        elif n <= 16:
            ibits = 1
        else:
            ibits = 0
        per = 1 << ibits
        bpp = 8 >> ibits
        main_w = (w + per - 1) // per
        packed = np.zeros((h, main_w), dtype=np.uint32)
        for sub in range(per):
            cols = idx[:, sub::per]
            packed[:, : cols.shape[1]] |= cols << (sub * bpp)
        main = np.zeros((h, main_w, 4), dtype=np.uint8)
        main[:, :, 0] = 0xFF
        main[:, :, 2] = packed.astype(np.uint8)
    else:
        raise ValueError(f"unknown encode mode {mode!r}")

    bw.write(0, 1)  # end of transforms
    _write_entropy_image(
        bw, _img_to_flat(np.asarray(main, dtype=np.uint8)), main_w, h,
        cache_bits, use_lz77, two_groups,
    )
    return bw.getvalue()


ENCODE_MODES = ("palette", "predictor", "subtract_green", "literal")


def encode_webp(
    pix: np.ndarray,
    mode: str = "auto",
    cache_bits: int = 4,
    use_lz77: bool = True,
    two_groups: bool = False,
) -> tuple[bytes, str] | bytes:
    """uint8 (h, w, 3|4) RGB(A) -> lossless WebP bytes.

    mode="auto" tries palette (when <= 256 distinct colors), predictor,
    subtract_green, literal and keeps the smallest output (ties to the
    earlier mode — fully deterministic). Returns bytes; use
    `encode_webp_auto` for (bytes, mode)."""
    data, _ = encode_webp_auto(pix, mode, cache_bits, use_lz77, two_groups)
    return data


def encode_webp_auto(
    pix: np.ndarray,
    mode: str = "auto",
    cache_bits: int = 4,
    use_lz77: bool = True,
    two_groups: bool = False,
) -> tuple[bytes, str]:
    assert pix.dtype == np.uint8 and pix.ndim == 3 and pix.shape[2] in (3, 4)
    h, w, c = pix.shape
    assert 1 <= w <= 16384 and 1 <= h <= 16384
    px = np.empty((h, w, 4), dtype=np.uint8)  # [a, r, g, b]
    px[:, :, 0] = pix[:, :, 3] if c == 4 else 255
    px[:, :, 1] = pix[:, :, 0]
    px[:, :, 2] = pix[:, :, 1]
    px[:, :, 3] = pix[:, :, 2]

    if mode == "auto":
        n_colors = len(np.unique(_argb_view(px)))
        candidates = [m for m in ENCODE_MODES if m != "palette" or n_colors <= 256]
        best = None
        for m in candidates:
            payload = _encode_vp8l(px, m, cache_bits, use_lz77, two_groups)
            if best is None or len(payload) < len(best[0]):
                best = (payload, m)
        payload, chosen = best
    else:
        payload = _encode_vp8l(px, mode, cache_bits, use_lz77, two_groups)
        chosen = mode

    pad = b"\x00" if len(payload) & 1 else b""
    riff_size = 4 + 8 + len(payload) + len(pad)
    data = (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + payload
        + pad
    )
    return data, chosen


def _argb_view(px: np.ndarray) -> np.ndarray:
    a = px.astype(np.uint32)
    return (a[:, :, 0] << 24) | (a[:, :, 1] << 16) | (a[:, :, 2] << 8) | a[:, :, 3]
