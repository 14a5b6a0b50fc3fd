"""Independent scalar BMP decoder (twin of rcspark/bmp.py).

Spec-forward re-implementation for the expected-parquet gate: its own
little-endian field reads (int.from_bytes, no struct), its own per-pixel
loops over padded rows, list-of-tuples output — intentionally nothing
shared with the engine's vectorized numpy decoder except the format spec.
"""

from __future__ import annotations


def _u(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off : off + n], "little")


def _i(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off : off + n], "little", signed=True)


def twin_decode_bmp(data: bytes) -> list[list[tuple[int, int, int]]]:
    """BMP bytes → rows of (r, g, b) tuples, top row first."""
    assert data[:2] == b"BM", "not a BMP"
    off = _u(data, 10, 4)
    hsize = _u(data, 14, 4)
    assert hsize >= 40, "core DIB unsupported"
    w = _i(data, 18, 4)
    h_signed = _i(data, 22, 4)
    bpp = _u(data, 28, 2)
    comp = _u(data, 30, 4)
    used = _u(data, 46, 4)
    assert comp == 0 and bpp in (8, 24), f"unsupported bpp={bpp} comp={comp}"
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    assert w > 0 and h > 0, "bad dims"
    row_bytes = w * (bpp // 8)
    stride = row_bytes + ((4 - row_bytes % 4) % 4)
    assert off + stride * h <= len(data), "truncated"

    palette: list[tuple[int, int, int]] = []
    if bpp == 8:
        n_pal = used if used else 256
        p = 14 + hsize
        for k in range(n_pal):
            b0, g0, r0 = data[p + 4 * k], data[p + 4 * k + 1], data[p + 4 * k + 2]
            palette.append((r0, g0, b0))

    out: list[list[tuple[int, int, int]]] = []
    for yy in range(h):
        src_row = yy if top_down else h - 1 - yy
        base = off + src_row * stride
        row: list[tuple[int, int, int]] = []
        for x in range(w):
            if bpp == 24:
                b0 = data[base + 3 * x]
                g0 = data[base + 3 * x + 1]
                r0 = data[base + 3 * x + 2]
                row.append((r0, g0, b0))
            else:
                row.append(palette[data[base + x]])
        out.append(row)
    return out
