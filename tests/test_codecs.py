from __future__ import annotations

import numpy as np

from rcspark.codecs import (
    decode_image,
    encode_ppm,
    encode_qppm,
    phash64,
    psnr,
    quantize,
)


def _img(seed=0, h=32, w=48):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_lossless():
    img = _img(1)
    out, fmt = decode_image(encode_ppm(img))
    assert fmt == "ppm"
    assert np.array_equal(out, img)


def test_qppm_psnr_in_lossy_band():
    img = _img(2, 64, 64)
    out, fmt = decode_image(encode_qppm(img))
    assert fmt == "qppm"
    assert np.array_equal(out, quantize(img))
    p = psnr(img, out)
    assert 40.0 <= p <= 50.0, p


def test_psnr_inf_on_equal():
    img = _img(3)
    assert psnr(img, img) == float("inf")


def test_phash_deterministic_and_robust():
    img = _img(4, 64, 64)
    h1 = phash64(img)
    assert h1 == phash64(img.copy())
    assert isinstance(h1, int)
    # quantization shouldn't move the perceptual hash much
    h2 = phash64(quantize(img))
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 6


# -- real PNG codec (round 3: rcspark.png) -------------------------------------

def _ref_filter_row(ftype, line, prev, ch):
    """INDEPENDENT forward implementation of RFC 2083 §6 scanline filters
    (the encoder side the decoder must invert) — written against the spec,
    sharing no code with rcspark.png."""
    import numpy as np

    n = len(line)
    out = bytearray(n)
    for x in range(n):
        raw = int(line[x])
        left = int(line[x - ch]) if x >= ch else 0
        up = int(prev[x])
        ul = int(prev[x - ch]) if x >= ch else 0
        if ftype == 0:
            v = raw
        elif ftype == 1:
            v = raw - left
        elif ftype == 2:
            v = raw - up
        elif ftype == 3:
            v = raw - ((left + up) >> 1)
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            v = raw - pred
        out[x] = v & 0xFF
    return bytes(out)


def test_png_roundtrip_identity():
    import numpy as np

    from rcspark.png import decode_png, encode_png

    rng = np.random.default_rng(13)
    pix = rng.integers(0, 256, size=(23, 17, 3), dtype=np.uint8)
    data = encode_png(pix)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(data)
    assert out.shape == (23, 17, 3)
    assert (out == pix).all()
    # deterministic bytes (stable digests across runs)
    assert encode_png(pix) == data


def test_png_decoder_inverts_all_spec_filters():
    """Hand-build a PNG whose five scanlines use filters 0..4, filtered by
    the independent reference implementation above; the decoder must
    recover the raw pixels exactly. Also cover greyscale and RGBA."""
    import struct
    import zlib

    import numpy as np

    from rcspark.png import decode_png

    def build(colour, ch, w=7):
        rng = np.random.default_rng(100 + colour)
        pix = rng.integers(0, 256, size=(5, w * ch), dtype=np.uint8)
        raw = bytearray()
        prev = bytes(w * ch)
        for y in range(5):
            raw.append(y)  # filter type = row index: covers 0..4
            filtered = _ref_filter_row(y, pix[y], prev, ch)
            raw.extend(filtered)
            prev = bytes(pix[y])
        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))
        ihdr = struct.pack(">IIBBBBB", w, 5, 8, colour, 0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"tEXt", b"Comment\x00made by the test")
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        return pix.reshape(5, w, ch), data

    for colour, ch in ((0, 1), (2, 3), (6, 4)):
        pix, data = build(colour, ch)
        out = decode_png(data)
        assert out.shape == pix.shape
        assert (out == pix).all(), f"colour type {colour}"


def test_png_rejects_corruption():
    import numpy as np
    import pytest

    from rcspark.png import decode_png, encode_png

    data = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    data[40] ^= 0xFF  # flip a byte inside a chunk → CRC must catch it
    with pytest.raises(ValueError):
        decode_png(bytes(data))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_image_pipeline_ingests_real_png(spark):
    """A16 with a REAL interchange format: PNG-encoded images flow through
    the same image_features mapInPandas stage as the numpy stand-ins, and
    decode_image's magic sniffing reports fmt='png'."""
    import numpy as np

    from rcspark.codecs import decode_image
    from rcspark.datapipe.multimodal import decode_external, image_features
    from rcspark.png import encode_png

    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        pix = rng.integers(0, 256, size=(10 + i, 8, 3), dtype=np.uint8)
        rows.append((f"png{i}", bytearray(encode_png(pix)), pix))
    df = spark.createDataFrame(
        [(r[0], bytes(r[1])) for r in rows], "image_id string, bytes binary"
    )
    feats = {r["image_id"]: r for r in image_features(df).collect()}
    for image_id, data, pix in rows:
        f = feats[image_id]
        assert (f["w"], f["h"], f["fmt"]) == (8, pix.shape[0], "png")
        assert abs(f["mean_r"] - pix[:, :, 0].mean()) < 1e-3  # means are rounded
        # decode_external (the former hard stub) now really decodes PNG
        assert (decode_external(bytes(data), "png") == pix).all()
        pix2, fmt = decode_image(bytes(data))
        assert fmt == "png" and (pix2 == pix).all()


# -- JPEG (round 4: the real lossy interchange codec) ---------------------------


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (30 + seed * 7 + yy * 2 + xx) % 230,
            (60 + xx * 2 + (yy * 3) // 2) % 230,
            (90 + yy + xx // 2) % 230,
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)


def test_jpeg_roundtrip_meets_lossy_psnr_gate():
    """The north rule's fidelity contract for lossy formats: PSNR ≥ 40 dB
    on smooth (photographic-class) content at high quality."""
    from rcspark.jpeg import decode_jpeg, encode_jpeg

    for h, w in ((32, 48), (37, 53), (64, 80)):
        img = _smooth(h, w)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == img.shape
        assert psnr(img, dec) >= 40.0, (h, w, psnr(img, dec))


def test_jpeg_constant_image_exact_and_bytes_deterministic():
    from rcspark.jpeg import decode_jpeg, encode_jpeg

    img = np.full((24, 16, 3), 137, np.uint8)
    data = encode_jpeg(img, quality=85)
    assert data == encode_jpeg(img, quality=85)
    assert (decode_jpeg(data) == img).all()


def test_jpeg_engine_decoder_matches_independent_twin_bitwise():
    """The PNG independent-twin pattern for the lossy codec: the vectorized
    engine decoder and scripts/jpeg_twin.py's scalar spec-forward decoder
    implement the same exact-integer decode contract, so their pixels must
    be BIT-identical — 4:4:4, 4:2:0, grey, odd sizes."""
    from scripts.jpeg_twin import twin_decode_jpeg

    from rcspark.jpeg import decode_jpeg, encode_jpeg

    img = _smooth(21, 29, seed=3)
    grey = img[:, :, 0].copy()
    cases = [
        encode_jpeg(img, quality=95),
        encode_jpeg(img, quality=70),
        encode_jpeg(img, quality=85, subsample=True),
        encode_jpeg(img, quality=30, subsample=True),
        encode_jpeg(grey, quality=90),
    ]
    for data in cases:
        eng = decode_jpeg(data)
        twin = np.array(twin_decode_jpeg(data), dtype=np.uint8)
        assert np.array_equal(eng, twin)


def test_jpeg_subsampled_is_smaller_and_still_decodable():
    from rcspark.jpeg import decode_jpeg, encode_jpeg

    img = _smooth(48, 64, seed=5)
    full = encode_jpeg(img, quality=85)
    sub = encode_jpeg(img, quality=85, subsample=True)
    assert len(sub) < len(full)
    assert decode_jpeg(sub).shape == img.shape


def test_jpeg_rejects_progressive_and_junk():
    import pytest

    from rcspark.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"notajpeg")
    # flip SOF0 to SOF2 (progressive) in a real stream
    data = bytearray(encode_jpeg(_smooth(16, 16), quality=80))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(data))


def test_jpeg_flows_through_decode_image_and_decode_external():
    from rcspark.datapipe.multimodal import decode_external
    from rcspark.jpeg import encode_jpeg

    img = _smooth(16, 24, seed=1)
    data = encode_jpeg(img, quality=92)
    pix, fmt = decode_image(data)
    assert fmt == "jpeg" and pix.shape == (16, 24, 3)
    assert psnr(img, pix) >= 38.0
    assert (decode_external(data, "jpeg") == pix).all()


def test_jpeg_quality_readback_recovers_encoder_quality():
    """estimate_jpeg_quality must recover the exact IJG quality the encoder
    used, for every quality in the curation gate's operating range —
    straight from the bytes' DQT, no metadata."""
    from rcspark.datapipe.multimodal import estimate_jpeg_quality
    from rcspark.jpeg import encode_jpeg

    img = _smooth(24, 32, seed=9)
    for q in (35, 50, 60, 75, 85, 90, 95):
        est, dist = estimate_jpeg_quality(encode_jpeg(img, quality=q))
        assert (est, dist) == (q, 0), (q, est, dist)


# -- WebP (VP8L lossless) — round 4 second half -------------------------------


def test_webp_roundtrip_lossless_every_mode():
    from rcspark.webp import decode_webp, encode_webp_auto

    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (11, 19, 3), dtype=np.uint8)
    smooth = _smooth(24, 17, seed=3)
    for img in (noise, smooth):
        for mode in ("literal", "subtract_green", "predictor", "color_transform"):
            data, m = encode_webp_auto(img, mode=mode)
            assert m == mode
            dec = decode_webp(data)
            assert np.array_equal(dec[:, :, :3], img)
            assert (dec[:, :, 3] == 255).all()


def test_webp_bytes_deterministic_and_auto_stable():
    from rcspark.webp import encode_webp_auto

    img = _smooth(32, 32, seed=9)
    d1, m1 = encode_webp_auto(img)
    d2, m2 = encode_webp_auto(img)
    assert d1 == d2 and m1 == m2


def test_webp_palette_packing_boundaries():
    """1/2/4/16/17/256 colors cross every sub-byte bundling width."""
    from rcspark.webp import decode_webp, encode_webp_auto

    rng = np.random.default_rng(13)
    for ncol in (1, 2, 3, 4, 5, 16, 17, 256):
        vals = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = vals[rng.integers(0, ncol, (9, 21))]
        data, m = encode_webp_auto(img, mode="palette")
        assert m == "palette"
        assert np.array_equal(decode_webp(data)[:, :, :3], img)


def test_webp_engine_decoder_matches_independent_twin_bitwise():
    """The PNG/JPEG independent-twin pattern: the engine decoder and
    scripts/webp_twin.py's scalar tree-walk decoder must agree
    bit-for-bit across transforms, color cache, LZ77, packed palettes,
    alpha, and the meta-prefix two-group path."""
    import sys

    sys.path.insert(0, ".")
    import numpy as np

    from scripts.webp_twin import twin_decode_webp

    from rcspark.webp import decode_webp, encode_webp_auto

    rng = np.random.default_rng(31)
    noise = rng.integers(0, 256, (13, 29, 3), dtype=np.uint8)
    rep = np.tile(rng.integers(0, 256, (3, 5, 3), dtype=np.uint8), (5, 7, 1))
    pal = (rng.integers(0, 4, (10, 33), dtype=np.uint8) * 80)[:, :, None].repeat(3, 2)
    rgba = rng.integers(0, 256, (8, 9, 4), dtype=np.uint8)
    cases = [
        (noise, dict(mode="literal")),
        (noise, dict(mode="subtract_green")),
        (noise, dict(mode="predictor")),
        (noise, dict(mode="color_transform")),
        (_smooth(32, 32, seed=7), dict(mode="auto")),
        (rep, dict(mode="literal", cache_bits=0, use_lz77=True)),
        (rep, dict(mode="literal", cache_bits=6, use_lz77=True)),
        (rep, dict(mode="literal", cache_bits=11, use_lz77=False)),
        (pal, dict(mode="palette")),
        (rgba, dict(mode="predictor")),
        (noise, dict(mode="subtract_green", two_groups=True, cache_bits=4)),
        (_smooth(40, 40, seed=8), dict(mode="predictor", two_groups=True)),
    ]
    for img, kw in cases:
        data, _ = encode_webp_auto(img, **kw)
        eng = decode_webp(data)
        twin = np.array(twin_decode_webp(data), dtype=np.uint8)
        assert np.array_equal(eng, twin), kw


def test_webp_rejects_junk_lossy_and_truncation():
    import pytest

    from rcspark.webp import decode_webp, encode_webp_auto

    with pytest.raises(ValueError, match="WebP"):
        decode_webp(b"notawebp" * 4)
    # lossy VP8 chunk is the documented external seam
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    data, _ = encode_webp_auto(_smooth(16, 16, seed=2))
    with pytest.raises(ValueError):
        decode_webp(data[: len(data) // 2])


def test_webp_flows_through_decode_image_and_decode_external():
    from rcspark.datapipe.multimodal import decode_external
    from rcspark.webp import encode_webp_auto

    img = _smooth(16, 24, seed=4)
    data, _ = encode_webp_auto(img)
    pix, fmt = decode_image(data)
    assert fmt == "webp" and pix.shape == (16, 24, 3)
    assert (pix == img).all()  # lossless
    assert (decode_external(data, "webp")[:, :, :3] == img).all()


def test_webp_smaller_than_raw_on_smooth_content():
    """The predictor transform must actually compress photographic-class
    content (not just wrap bytes): < 0.5 byte/channel on the shared
    smooth fixtures vs 3 bytes/px raw."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.webp import encode_webp_auto

    for iid in ("img40", "img4000"):
        pix = make_smooth_image(iid)
        data, mode = encode_webp_auto(pix)
        assert mode == "predictor"
        assert len(data) < 0.5 * pix.size


def test_webp_corruption_never_escapes_valueerror():
    """Any byte corruption or truncation must surface as ValueError (or
    the NotImplementedError lossy seam) — never IndexError/KeyError — so
    a hostile corpus can't crash the vectorized decode UDFs."""
    from rcspark.webp import decode_webp, encode_webp_auto

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    data, _ = encode_webp_auto(img, mode="predictor", cache_bits=4)
    for _ in range(400):
        buf = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            buf[int(rng.integers(12, len(buf)))] = int(rng.integers(0, 256))
        try:
            decode_webp(bytes(buf))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(data), 3):
        try:
            decode_webp(data[:cut])
        except (ValueError, NotImplementedError):
            pass


# ---------------------------------------------------------------------------
# GIF (round 4: real GIF87a/89a codec — rcspark/gif.py)
# ---------------------------------------------------------------------------


def test_gif_exact_palette_roundtrip_lossless():
    from rcspark.gif import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    for ncol in (1, 2, 3, 4, 5, 16, 17, 200, 256):
        vals = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = vals[rng.integers(0, ncol, (9, 21))]
        data, mode = encode_gif(img)
        assert mode == "exact"
        assert np.array_equal(decode_gif(data), img)


def test_gif_truecolor_decodes_to_exact_332_quantization():
    from rcspark.gif import decode_gif, encode_gif, quantize_332

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (33, 27, 3), dtype=np.uint8)
    data, mode = encode_gif(img)
    assert mode == "p332"
    assert np.array_equal(decode_gif(data), quantize_332(img))


def test_gif_interlaced_decodes_identically():
    from rcspark.gif import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    for h in (1, 2, 3, 5, 8, 13, 29):  # every interlace-pass boundary class
        img = (rng.integers(0, 6, (h, 15, 3), dtype=np.uint8)) * 40
        plain, m1 = encode_gif(img)
        inter, m2 = encode_gif(img, interlace=True)
        assert m1 == m2 == "exact"
        assert np.array_equal(decode_gif(inter), decode_gif(plain))


def test_gif_bytes_deterministic():
    from rcspark.fixtures import make_smooth_image
    from rcspark.gif import encode_gif

    pix = make_smooth_image("img40")
    assert encode_gif(pix) == encode_gif(pix)


def test_gif_lzw_survives_dictionary_reset():
    """>4096 dictionary entries forces the mid-stream CLEAR/reset path."""
    from rcspark.gif import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    data, mode = encode_gif(img)
    assert mode == "p332"
    from rcspark.gif import quantize_332

    assert np.array_equal(decode_gif(data), quantize_332(img))


def test_gif_engine_decoder_matches_independent_twin_bitwise():
    import sys

    sys.path.insert(0, "/root/repo")
    from rcspark.fixtures import make_smooth_image
    from rcspark.gif import decode_gif, encode_gif
    from scripts.gif_twin import twin_decode_gif

    for iid in ("img0", "img40", "img2000", "img4000"):
        pix = make_smooth_image(iid)
        data, _ = encode_gif(pix)
        eng = decode_gif(data)
        twin = np.array(twin_decode_gif(data), dtype=np.uint8)
        assert np.array_equal(eng, twin)


def test_gif_animation_frames_and_disposal_compositing():
    """Hand-built animation: frame 2 is a transparent PATCH over frame 1
    (disposal 1 = leave), so the composited second canvas must show frame
    1 pixels through the transparent holes; disposal 2 then restores the
    patch region to background for frame 3."""
    import struct

    from rcspark.gif import decode_gif_frames

    # 4x4 canvas, 4-color GCT (pow2 table: bits=2)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 4, 4)
    out.append(0x80 | (7 << 4) | 1)  # GCT, 4 entries
    out += b"\x00\x00" + pal

    from rcspark.gif import _lzw_encode, _sub_blocks

    def frame(idx_bytes, left, top, w, h, disposal, transparent=None):
        b = bytearray(b"\x21\xf9\x04")
        flags = (disposal & 7) << 2
        if transparent is not None:
            flags |= 1
        b.append(flags)
        b += struct.pack("<H", 4)
        b.append(transparent if transparent is not None else 0)
        b.append(0)
        b += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00"
        b.append(2)
        b += _sub_blocks(_lzw_encode(idx_bytes, 2))
        return bytes(b)

    out += frame(bytes([0] * 16), 0, 0, 4, 4, disposal=1)  # all red
    # 2x2 patch at (1,1): [green, transparent, transparent, blue]
    out += frame(bytes([1, 3, 3, 2]), 1, 1, 2, 2, disposal=2, transparent=3)
    out += frame(bytes([2] * 16), 0, 0, 4, 4, disposal=0)  # all blue
    out.append(0x3B)

    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 3
    assert (frames[0] == [255, 0, 0]).all()
    f2 = frames[1]
    assert tuple(f2[1, 1]) == (0, 255, 0)  # green
    assert tuple(f2[1, 2]) == (255, 0, 0)  # transparent → frame 1 shows
    assert tuple(f2[2, 1]) == (255, 0, 0)
    assert tuple(f2[2, 2]) == (0, 0, 255)  # blue
    assert (frames[2] == [0, 0, 255]).all()

    # twin agrees frame by frame
    import sys

    sys.path.insert(0, "/root/repo")
    from scripts.gif_twin import twin_decode_gif_frames

    twin = twin_decode_gif_frames(bytes(out))
    for a, b in zip(frames, twin):
        assert np.array_equal(a, np.array(b, dtype=np.uint8))


def test_gif_encoder_animation_roundtrip():
    from rcspark.fixtures import make_shot_frames
    from rcspark.gif import decode_gif_frames, encode_gif_frames, quantize_332

    frames = [np.ascontiguousarray(f) for f in make_shot_frames("vid7")]
    data, mode = encode_gif_frames(frames, delays_cs=[4] * len(frames))
    dec = decode_gif_frames(data)
    assert len(dec) == len(frames)
    for d, src in zip(dec, frames):
        want = src if mode == "exact" else quantize_332(src)
        assert np.array_equal(d, want)


def test_gif_flows_through_decode_image_and_decode_external():
    from rcspark.datapipe.multimodal import decode_external
    from rcspark.gif import encode_gif

    rng = np.random.default_rng(8)
    vals = rng.integers(0, 256, (12, 3), dtype=np.uint8)
    img = vals[rng.integers(0, 12, (10, 14))]
    data, mode = encode_gif(img)
    assert mode == "exact"
    pix, fmt = decode_image(data)
    assert fmt == "gif" and np.array_equal(pix, img)
    assert np.array_equal(decode_external(data, "gif"), img)


def test_gif_corruption_never_escapes_valueerror():
    import pytest

    from rcspark.gif import decode_gif, encode_gif

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    data, _ = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"notagif" * 5)
    for _ in range(400):
        buf = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            buf[int(rng.integers(6, len(buf)))] = int(rng.integers(0, 256))
        try:
            decode_gif(bytes(buf))
        except ValueError:
            pass
    for cut in range(1, len(data), 3):
        try:
            decode_gif(data[:cut])
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# EXIF orientation (round 4: APP1 plant/read + exif_transpose semantics)
# ---------------------------------------------------------------------------


def test_exif_orientation_plant_read_all_values():
    from rcspark.jpeg import encode_jpeg, read_exif_orientation

    rng = np.random.default_rng(21)
    pix = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    for o in range(1, 9):
        data = encode_jpeg(pix, quality=90, exif_orientation=o)
        assert read_exif_orientation(data) == o
    assert read_exif_orientation(encode_jpeg(pix, quality=90)) == 1


def test_exif_app1_does_not_change_decoded_pixels_or_plain_bytes():
    from rcspark.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(22)
    pix = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    plain = encode_jpeg(pix, quality=90)
    tagged = encode_jpeg(pix, quality=90, exif_orientation=6)
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(tagged))
    assert plain == encode_jpeg(pix, quality=90)  # None leaves bytes stable


def test_exif_orientation_transforms_are_involutive_where_expected():
    """Applying the transform twice must identity for 2,3,4 (mirrors/180),
    and 5/7 are self-inverse transposes; 6 and 8 invert each other."""
    from rcspark.datapipe.multimodal import apply_exif_orientation as ap

    rng = np.random.default_rng(23)
    pix = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    for o in (2, 3, 4, 5, 7):
        assert np.array_equal(ap(ap(pix, o), o), pix), o
    assert np.array_equal(ap(ap(pix, 6), 8), pix)
    assert np.array_equal(ap(ap(pix, 8), 6), pix)
    assert ap(pix, 5).shape == (13, 9, 3)


def test_exif_orientation_big_endian_tiff_and_junk():
    import struct

    import pytest

    from rcspark.jpeg import encode_jpeg, read_exif_orientation

    rng = np.random.default_rng(24)
    pix = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    # hand-build a BIG-endian (MM) Exif APP1 with orientation 7
    tiff = (
        b"MM\x00*" + struct.pack(">I", 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHIHH", 0x0112, 3, 1, 7, 0)
        + struct.pack(">I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    plain = encode_jpeg(pix, quality=90)
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    data = plain[:2] + app1 + plain[2:]
    assert read_exif_orientation(data) == 7
    with pytest.raises(ValueError):
        read_exif_orientation(b"junkjunk")
    # orientation 0 in the tag is invalid
    bad = data.replace(struct.pack(">HHIHH", 0x0112, 3, 1, 7, 0),
                       struct.pack(">HHIHH", 0x0112, 3, 1, 0, 0))
    with pytest.raises(ValueError):
        read_exif_orientation(bad)


def test_gif_hostile_amplification_bounded():
    """A tiny GIF must not amplify into unbounded canvas copies:
    zero-area frames are rejected, and frame-count x canvas-size is
    budgeted (GIF_MAX_TOTAL_PIXELS)."""
    import struct

    import pytest

    from rcspark.gif import GIF_MAX_TOTAL_PIXELS, decode_gif_frames

    pal = bytes(6)
    head = bytearray(b"GIF89a") + struct.pack("<HH", 8000, 8000)
    head.append(0x80 | (7 << 4) | 0)
    head += b"\x00\x00" + pal
    zero = b"\x2c" + struct.pack("<HHHH", 0, 0, 0, 0) + b"\x00\x02\x01\x44\x00"
    with pytest.raises(ValueError):
        decode_gif_frames(bytes(head + zero + b"\x3b"))
    # many full-screen frames exceed the pixel budget before materializing
    full = b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00\x02\x01\x44\x00"
    n = GIF_MAX_TOTAL_PIXELS // (8000 * 8000) + 1
    with pytest.raises(ValueError):
        decode_gif_frames(bytes(head + full * (n + 1) + b"\x3b"))


def test_gif_delays_length_mismatch_raises():
    import numpy as np
    import pytest

    from rcspark.gif import encode_gif_frames

    frames = [np.zeros((4, 4, 3), dtype=np.uint8)] * 3
    with pytest.raises(ValueError):
        encode_gif_frames(frames, delays_cs=[4])


def test_exif_walk_survives_fill_bytes_and_hostile_ifd():
    import struct

    import numpy as np

    from rcspark.jpeg import encode_jpeg, read_exif_orientation

    pix = np.random.default_rng(2).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    plain = encode_jpeg(pix, quality=90, exif_orientation=6)
    # T.81 fill bytes + a standalone TEM marker before the APP1
    assert read_exif_orientation(plain[:2] + b"\xff\xff\xff\x01" + plain[2:]) == 6
    # hostile IFD offset outside the APP1 segment → treated as absent
    tagged = bytearray(encode_jpeg(pix, quality=90, exif_orientation=3))
    i = tagged.find(b"Exif\x00\x00") + 6
    tagged[i + 4 : i + 8] = struct.pack("<I", 0xFFFFF0)
    assert read_exif_orientation(bytes(tagged)) == 1


def test_idna_host_quarantines_bad_hosts(spark):
    """One malformed host must yield NULL, not abort the stage."""
    from pyspark.sql import functions as F

    from rcspark.urlnorm import idna_host

    df = spark.createDataFrame(
        [("münchen.example",), ("a..example.com",), (None,), ("x" * 80 + ".com",)],
        "host string",
    )
    rows = df.select(idna_host(F.col("host")).alias("a")).collect()
    vals = [r["a"] for r in rows]
    assert vals[0] == "xn--mnchen-3ya.example"
    assert vals[1] is None and vals[2] is None and vals[3] is None


# --------------------------------------------------------------------------
# BMP (batch 22)
# --------------------------------------------------------------------------

def test_bmp_roundtrip_all_padding_residues():
    import numpy as np

    from rcspark.bmp import decode_bmp, encode_bmp

    rng = np.random.default_rng(22)
    for w in (13, 14, 15, 16, 17, 64):
        pix = rng.integers(0, 256, (9, w, 3), dtype=np.uint8)
        data = encode_bmp(pix)
        assert data[:2] == b"BM"
        assert len(data) == 54 + ((w * 3 + 3) & ~3) * 9
        assert np.array_equal(decode_bmp(data), pix)


def test_bmp_top_down_decode():
    import struct

    import numpy as np

    from rcspark.bmp import decode_bmp, encode_bmp

    pix = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    data = bytearray(encode_bmp(pix))
    # flip to top-down: negate height, reverse the stored row order
    struct.pack_into("<i", data, 22, -5)
    stride = (4 * 3 + 3) & ~3
    body = data[54:]
    rows = [bytes(body[i * stride:(i + 1) * stride]) for i in range(5)]
    data[54:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), pix)


def test_bmp_8bpp_palette_decode():
    import struct

    import numpy as np

    from rcspark.bmp import decode_bmp
    from scripts.bmp_twin import twin_decode_bmp

    w, h, n_pal = 5, 3, 4
    pal = [(10, 20, 30), (200, 0, 0), (0, 200, 0), (0, 0, 200)]  # RGB
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1], [1, 1, 2, 2, 3]], dtype=np.uint8)
    stride = (w + 3) & ~3
    off = 14 + 40 + 4 * n_pal
    body = b"".join(
        bytes(idx[h - 1 - y].tolist()) + b"\x00" * (stride - w) for y in range(h)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, n_pal, 0)
    pal_bytes = b"".join(bytes((b, g, r, 0)) for r, g, b in pal)
    data = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off) + info + pal_bytes + body
    want = np.array([[pal[v] for v in row] for row in idx], dtype=np.uint8)
    assert np.array_equal(decode_bmp(data), want)
    assert np.array_equal(np.array(twin_decode_bmp(data), dtype=np.uint8), want)


def test_bmp_hostile_bytes_raise():
    import struct

    import numpy as np
    import pytest

    from rcspark.bmp import decode_bmp, encode_bmp

    pix = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_bmp(pix)
    with pytest.raises(ValueError):
        decode_bmp(b"NOPE" + good[4:])
    with pytest.raises(ValueError):
        decode_bmp(good[:40])  # truncated header
    trunc = bytearray(good)
    struct.pack_into("<i", trunc, 18, 10_000)  # width claims beyond the data
    with pytest.raises(ValueError):
        decode_bmp(bytes(trunc))
    huge = bytearray(good)
    struct.pack_into("<i", huge, 18, 1 << 20)  # dimension guard
    with pytest.raises(ValueError):
        decode_bmp(bytes(huge))
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8 unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(rle))


def test_bmp_engine_twin_agree_on_fixture_crops():
    import numpy as np

    from rcspark.bmp import decode_bmp, encode_bmp
    from rcspark.datapipe.multimodal import _bmp_fixture_pixels
    from scripts.bmp_twin import twin_decode_bmp

    crops_seen = set()
    for k in range(0, 1600, 40):
        pix = _bmp_fixture_pixels(f"img{k}")
        crops_seen.add(pix.shape[1] % 4)
        data = encode_bmp(pix)
        assert np.array_equal(decode_bmp(data), pix)
        assert np.array_equal(np.array(twin_decode_bmp(data), dtype=np.uint8), pix)
    assert crops_seen == {0, 1, 2, 3}  # every 4-byte stride residue occurs


def test_ssim_exact_contract_properties():
    """Exact-integer SSIM: identity is exactly 1e6 ppm, a constant
    brightness shift lowers it through the luminance term only, and noise
    lowers it further; engine block-reduction equals the scalar twin."""
    import numpy as np

    from rcspark.datapipe.multimodal import _ssim_ppm_exact
    from rcspark.fixtures import make_smooth_image

    pix = make_smooth_image("img0")
    assert _ssim_ppm_exact(pix, pix) == (1_000_000, 64)

    shifted = np.clip(pix.astype(np.int64) + 12, 0, 255).astype(np.uint8)
    s_shift, _ = _ssim_ppm_exact(pix, shifted)
    assert s_shift < 1_000_000

    rng = np.random.default_rng(7)
    noisy = np.clip(
        pix.astype(np.int64) + rng.integers(-25, 26, pix.shape), 0, 255
    ).astype(np.uint8)
    s_noise, _ = _ssim_ppm_exact(pix, noisy)
    assert s_noise < s_shift


def test_ssim_engine_equals_scalar_twin():
    """The numpy block reduction and the twin's scalar per-pixel walk land
    on identical ppm for real JPEG roundtrips (a handful of ids; the full
    500-id pinning is the expected parquet the driver hashes)."""
    from rcspark.datapipe.multimodal import _ssim_ppm_exact
    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import decode_jpeg, encode_jpeg
    from rcspark.xxh import xxh64
    from scripts.jpeg_twin import twin_decode_jpeg

    for k in (0, 40, 80, 120):
        iid = f"img{k}"
        q = 30 + ((xxh64(iid.encode()) >> 24) % 61)
        pix = make_smooth_image(iid)
        data = encode_jpeg(pix, quality=q)
        ppm_engine, nb = _ssim_ppm_exact(pix, decode_jpeg(data))

        dec = twin_decode_jpeg(data)
        h, w = len(dec), len(dec[0])
        ly = [[(77 * dec[y][x][0] + 150 * dec[y][x][1] + 29 * dec[y][x][2])
               // 256 for x in range(w)] for y in range(h)]
        lx = [[(77 * int(pix[y, x, 0]) + 150 * int(pix[y, x, 1])
                + 29 * int(pix[y, x, 2])) // 256 for x in range(w)]
              for y in range(h)]
        n, c1, c2, s = 64, 65025, 585225, 10_000
        total = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                sx = sy = sxx = syy = sxy = 0
                for dy in range(8):
                    for dx in range(8):
                        a = lx[by * 8 + dy][bx * 8 + dx]
                        b = ly[by * 8 + dy][bx * 8 + dx]
                        sx += a; sy += b
                        sxx += a * a; syy += b * b; sxy += a * b
                n1 = s * 2 * sx * sy + c1 * n * n
                d1 = s * (sx * sx + sy * sy) + c1 * n * n
                n2 = s * 2 * (n * sxy - sx * sy) + c2 * n * n
                d2 = s * ((n * sxx - sx * sx) + (n * syy - sy * sy)) + c2 * n * n
                total += (1_000_000 * n1 * n2) // (d1 * d2)
        assert ppm_engine == total // nb


def test_exif_plant_scrub_roundtrip():
    """Whitelist scrub: GPS drops, orientation survives, idempotent, and
    a JPEG with no Exif APP1 passes through byte-identical."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import (
        encode_jpeg, plant_exif, read_exif_orientation, scrub_exif_metadata,
    )

    base = encode_jpeg(make_smooth_image("img0"), quality=80)
    for o in (1, 6, 8):
        planted = plant_exif(base, o, (37_774_900, -122_419_400))
        assert read_exif_orientation(planted) == o
        clean, had_gps, o_read = scrub_exif_metadata(planted)
        assert had_gps and o_read == o
        assert read_exif_orientation(clean) == o
        assert len(clean) < len(planted)
        again, g2, o2 = scrub_exif_metadata(clean)
        assert again == clean and not g2 and o2 == o  # idempotent
    # no-GPS plant: scrub keeps orientation, reports no GPS
    p2 = plant_exif(base, 3, None)
    c2, g, o = scrub_exif_metadata(p2)
    assert not g and o == 3 and read_exif_orientation(c2) == 3
    # no Exif at all
    c3, g3, o3 = scrub_exif_metadata(base)
    assert c3 == base and not g3 and o3 == 1


def test_exif_scrub_engine_equals_scalar_twin():
    """Engine scrub_exif_metadata lands on the twin's bytes (md5) for real
    planted fixtures; the full 667-id pinning is the expected parquet."""
    import hashlib

    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import encode_jpeg, plant_exif, scrub_exif_metadata
    from rcspark.xxh import xxh64
    from scripts.gen_media_expected import expected_img_exif_scrub

    exp = expected_img_exif_scrub().set_index("image_id")
    seen_gps = set()
    for k in (0, 30, 60, 150, 180):  # 150/180 carry no GPS in the fixture
        iid = f"img{k}"
        hv = xxh64(iid.encode())
        o = 1 + ((hv >> 16) % 8)
        gps = (None if (hv >> 8) % 3 == 0 else
               (((hv >> 13) % 180_000_000) - 90_000_000,
                ((hv >> 17) % 360_000_000) - 180_000_000))
        planted = plant_exif(
            encode_jpeg(make_smooth_image(iid), quality=80), o, gps)
        clean, had_gps, _ = scrub_exif_metadata(planted)
        row = exp.loc[iid]
        assert hashlib.md5(clean).hexdigest() == row.clean_md5
        assert had_gps == row.had_gps and len(clean) == row.n_after
        seen_gps.add(had_gps)
    assert seen_gps == {True, False}
