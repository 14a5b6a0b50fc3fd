"""Independent scalar VP8L (lossless WebP) decoder — the expected-values
twin for rcspark/webp.py (the scripts/jpeg_twin.py pattern).

Written spec-forward from the public WebP Lossless Bitstream Specification
(RFC 9649), deliberately structured differently from the engine decoder:

- per-byte bit reader (engine: whole-buffer big int);
- binary-tree prefix decoding built by inserting canonical codes bit by
  bit (engine: {(len, code): sym} dict walk);
- pure-Python int pixel math, one pixel at a time (engine: numpy arrays);
- the 2D distance map is re-derived here with its own construction loop
  from the documented rule: 120 (dx, dy), dy 0..7, dx -7..8, dy>0 or dx>0,
  ordered by (dx^2+dy^2, |dx|, positive-dx-first).

Shared contract choices (documented in rcspark/webp.py's module docstring):
Select ties to T, ClampAddSubtractHalf truncates toward zero, the
top-right neighbor of a rightmost-column pixel is the same row's leftmost
pixel. tests/test_codecs.py pins twin == engine bitwise on every fixture.
"""

from __future__ import annotations

CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class Bits:
    def __init__(self, data):
        self.data = data
        self.byte = 0
        self.bit = 0

    def u(self, n):
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("twin: out of bits")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class Tree:
    """Prefix-code binary tree; canonical assignment by (length, symbol)."""

    def __init__(self, lengths):
        present = sorted(
            (lengths[s], s) for s in range(len(lengths)) if lengths[s] > 0
        )
        if not present:
            raise ValueError("twin: empty code")
        if len(present) == 1:
            self.leaf_only = present[0][1]
            return
        self.leaf_only = None
        self.root = [None, None]
        code = 0
        prev = 0
        total = 0
        for length, sym in present:
            code <<= length - prev
            prev = length
            node = self.root
            for i in range(length - 1, 0, -1):
                b = (code >> i) & 1
                if node[b] is None:
                    node[b] = [None, None]
                node = node[b]
            node[code & 1] = sym
            code += 1
            total += 1 << (15 - length)
        if total != 1 << 15:
            raise ValueError("twin: code not full")

    def read(self, bits):
        if self.leaf_only is not None:
            return self.leaf_only
        node = self.root
        while True:
            node = node[bits.u(1)]
            if node is None:
                raise ValueError("twin: dead branch")
            if not isinstance(node, list):
                return node


def _distance_map():
    rows = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            rows.append((dx * dx + dy * dy, abs(dx), 0 if dx > 0 else 1, dx, dy))
    rows.sort()
    return [(dx, dy) for _, _, _, dx, dy in rows]


DMAP = _distance_map()


def _prefix_value(bits, code):
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    base = (2 + (code & 1)) << extra
    return base + bits.u(extra) + 1


def _read_lengths(bits, alphabet):
    n_codes = 4 + bits.u(4)
    cl = [0] * 19
    for i in range(n_codes):
        cl[CODE_LENGTH_ORDER[i]] = bits.u(3)
    tree = Tree(cl)
    if bits.u(1):
        budget = 2 + bits.u(2 + 2 * bits.u(3))
    else:
        budget = alphabet
    lengths = [0] * alphabet
    prev_nz = 8
    k = 0
    while k < alphabet and budget > 0:
        budget -= 1
        c = tree.read(bits)
        if c < 16:
            lengths[k] = c
            k += 1
            if c > 0:
                prev_nz = c
        elif c == 16:
            for _ in range(3 + bits.u(2)):
                if k < alphabet:
                    lengths[k] = prev_nz
                    k += 1
        elif c == 17:
            k += 3 + bits.u(3)
        else:
            k += 11 + bits.u(7)
    if k > alphabet:
        k = alphabet
    return lengths


def _read_tree(bits, alphabet):
    if bits.u(1):  # simple
        two = bits.u(1)
        lengths = [0] * alphabet
        s0 = bits.u(8) if bits.u(1) else bits.u(1)
        if s0 >= alphabet:
            raise ValueError("twin: simple symbol out of range")
        lengths[s0] = 1
        if two:
            s1 = bits.u(8)
            if s1 >= alphabet:
                raise ValueError("twin: simple symbol out of range")
            lengths[s1] = 1
        return Tree(lengths)
    return Tree(_read_lengths(bits, alphabet))


def _spatial(bits, w, h, top_level):
    """One spatially-coded image -> flat list of (a, r, g, b) tuples."""
    cache_size = 0
    if bits.u(1):
        cache_size = 1 << bits.u(4)
    cache = [(0, 0, 0, 0)] * cache_size

    block_shift = 0
    meta = None
    meta_w = 0
    if top_level and bits.u(1):
        block_shift = bits.u(3) + 2
        meta_w = (w + (1 << block_shift) - 1) >> block_shift
        meta_h = (h + (1 << block_shift) - 1) >> block_shift
        meta = _spatial(bits, meta_w, meta_h, False)
        n_trees = 1 + max((px[1] << 8) | px[2] for px in meta)
    else:
        n_trees = 1

    green_n = 256 + 24 + cache_size
    forests = []
    for _ in range(n_trees):
        forests.append(
            {
                "green": _read_tree(bits, green_n),
                "red": _read_tree(bits, 256),
                "blue": _read_tree(bits, 256),
                "alpha": _read_tree(bits, 256),
                "dist": _read_tree(bits, 40),
            }
        )

    cache_bits = cache_size.bit_length() - 1 if cache_size else 0

    def remember(p):
        if cache_size:
            argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
            cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = p

    out = []
    total = w * h
    while len(out) < total:
        i = len(out)
        if meta is not None:
            bx = (i % w) >> block_shift
            by = (i // w) >> block_shift
            mpx = meta[by * meta_w + bx]
            trees = forests[(mpx[1] << 8) | mpx[2]]
        else:
            trees = forests[0]
        g = trees["green"].read(bits)
        if g < 256:
            r = trees["red"].read(bits)
            b = trees["blue"].read(bits)
            a = trees["alpha"].read(bits)
            px = (a, r, g, b)
            out.append(px)
            remember(px)
        elif g < 280:
            length = _prefix_value(bits, g - 256)
            plane = _prefix_value(bits, trees["dist"].read(bits))
            if plane > 120:
                dist = plane - 120
            else:
                dx, dy = DMAP[plane - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > len(out):
                raise ValueError("twin: reference before start")
            for _ in range(length):
                px = out[len(out) - dist]
                out.append(px)
                remember(px)
        else:
            out.append(cache[g - 280])
    return out


def _avg(x, y):
    return (x + y) >> 1


def _clip(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _predicted(mode, left, top, topleft, topright):
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return tuple(
            _avg(_avg(left[c], topright[c]), top[c]) for c in range(4)
        )
    if mode == 6:
        return tuple(_avg(left[c], topleft[c]) for c in range(4))
    if mode == 7:
        return tuple(_avg(left[c], top[c]) for c in range(4))
    if mode == 8:
        return tuple(_avg(topleft[c], top[c]) for c in range(4))
    if mode == 9:
        return tuple(_avg(top[c], topright[c]) for c in range(4))
    if mode == 10:
        return tuple(
            _avg(_avg(left[c], topleft[c]), _avg(top[c], topright[c]))
            for c in range(4)
        )
    if mode == 11:
        est = [left[c] + top[c] - topleft[c] for c in range(4)]
        dt = sum(abs(est[c] - top[c]) for c in range(4))
        dl = sum(abs(est[c] - left[c]) for c in range(4))
        return top if dt <= dl else left
    if mode == 12:
        return tuple(
            _clip(left[c] + top[c] - topleft[c]) for c in range(4)
        )
    if mode == 13:
        res = []
        for c in range(4):
            m = _avg(left[c], top[c])
            d = m - topleft[c]
            half = d // 2 if d >= 0 else -((-d) // 2)  # trunc toward zero
            res.append(_clip(m + half))
        return tuple(res)
    raise ValueError("twin: predictor mode")


def _signed(b):
    return b - 256 if b >= 128 else b


def _cdelta(t, c):
    return (_signed(t) * _signed(c)) >> 5


def twin_decode_webp(data):
    """WebP bytes -> list of rows, each row a list of [r, g, b, a] lists."""
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WEBP":
        raise ValueError("twin: not webp")
    off = 12
    payload = None
    while off + 8 <= len(data):
        tag = bytes(data[off : off + 4])
        size = int.from_bytes(data[off + 4 : off + 8], "little")
        if tag == b"VP8L":
            payload = data[off + 8 : off + 8 + size]
            break
        off += 8 + size + (size % 2)
    if payload is None or payload[0] != 0x2F:
        raise ValueError("twin: no VP8L payload")
    bits = Bits(payload[1:])
    w = bits.u(14) + 1
    h = bits.u(14) + 1
    bits.u(1)
    if bits.u(3) != 0:
        raise ValueError("twin: version")

    chain = []
    cur_w = w
    while bits.u(1):
        kind = bits.u(2)
        if kind == 0 or kind == 1:
            shift = bits.u(3) + 2
            tw = (cur_w + (1 << shift) - 1) >> shift
            th = (h + (1 << shift) - 1) >> shift
            tiles = _spatial(bits, tw, th, False)
            chain.append((kind, shift, tw, tiles))
        elif kind == 2:
            chain.append((2,))
        else:
            n_pal = bits.u(8) + 1
            raw = _spatial(bits, n_pal, 1, False)
            pal = []
            acc = (0, 0, 0, 0)
            for px in raw:
                acc = tuple((acc[c] + px[c]) & 0xFF for c in range(4))
                pal.append(acc)
            chain.append((3, pal, cur_w))
            if n_pal <= 2:
                fold = 8
            elif n_pal <= 4:
                fold = 4
            elif n_pal <= 16:
                fold = 2
            else:
                fold = 1
            cur_w = (cur_w + fold - 1) // fold

    img = _spatial(bits, cur_w, h, True)
    width = cur_w

    for t in reversed(chain):
        if t[0] == 3:
            _, pal, full_w = t
            n_pal = len(pal)
            if n_pal <= 2:
                fold, ibits = 8, 1
            elif n_pal <= 4:
                fold, ibits = 4, 2
            elif n_pal <= 16:
                fold, ibits = 2, 4
            else:
                fold, ibits = 1, 8
            unpacked = []
            for y in range(h):
                for x in range(full_w):
                    packed = img[y * width + x // fold][2]
                    j = (packed >> ((x % fold) * ibits)) & ((1 << ibits) - 1)
                    unpacked.append(pal[j] if j < n_pal else pal[0])
            img = unpacked
            width = full_w
        elif t[0] == 2:
            img = [
                (a, (r + g) & 0xFF, g, (b + g) & 0xFF) for (a, r, g, b) in img
            ]
        elif t[0] == 0:
            _, shift, tw, tiles = t
            out = []
            for y in range(h):
                for x in range(width):
                    if x == 0 and y == 0:
                        pred = (255, 0, 0, 0)
                    else:
                        if y == 0:
                            mode = 1
                        elif x == 0:
                            mode = 2
                        else:
                            mode = tiles[(y >> shift) * tw + (x >> shift)][2]
                        left = out[-1] if x > 0 else None
                        top = out[(y - 1) * width + x] if y > 0 else None
                        topleft = (
                            out[(y - 1) * width + x - 1] if x > 0 and y > 0 else None
                        )
                        if y > 0 and x + 1 < width:
                            topright = out[(y - 1) * width + x + 1]
                        elif y > 0 and x > 0:
                            topright = out[y * width]  # same row, leftmost
                        else:
                            topright = None  # x == 0: mode forced to 2
                        pred = _predicted(mode, left, top, topleft, topright)
                    res = img[y * width + x]
                    out.append(tuple((res[c] + pred[c]) & 0xFF for c in range(4)))
            img = out
        else:
            _, shift, tw, tiles = t
            out = []
            for y in range(h):
                for x in range(width):
                    tile = tiles[(y >> shift) * tw + (x >> shift)]
                    g2r, g2b, r2b = tile[3], tile[2], tile[1]
                    a, r, g, b = img[y * width + x]
                    r = (r + _cdelta(g2r, g)) & 0xFF
                    b = (b + _cdelta(g2b, g) + _cdelta(r2b, r)) & 0xFF
                    out.append((a, r, g, b))
            img = out

    return [
        [[img[y * width + x][1], img[y * width + x][2], img[y * width + x][3], img[y * width + x][0]] for x in range(width)]
        for y in range(h)
    ]
