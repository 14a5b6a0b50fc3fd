"""Multimodal (image) columns — decode / feature-extract / resize plumbing.

Images ride as opaque ``binary`` columns with typed metadata (the
BASELINE.json input_hint shape: image_id, bytes, w, h, fmt, caption, phash).
The container has no PIL/cv2/imageio (SURVEY.md §0.3), so the *codec* layer
is the numpy-only PPM/QPPM pair from rcspark.codecs — deterministic and
PSNR-measurable — while real-codec decode is stubbed behind
``decode_external`` with a clear NotImplementedError. The Spark-side
plumbing (schemas, mapInPandas batching, narrow projections before the UDF)
is the part that carries to a real cluster unchanged.

Scale notes: the UDFs are ``mapInPandas`` so each Arrow batch is processed
in one numpy pass; `bytes` is always the LAST column selected into the UDF
and is dropped immediately after (UDFs block column pruning through
themselves — never let blob columns ride further than they must).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image, encode_ppm, encode_qppm, phash64, psnr, quantize

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("psnr_db", T.DoubleType(), True),
    ]
)


def decode_external(data: bytes, fmt: str) -> np.ndarray:
    """Real-codec decode for interchange formats. PNG is REAL (round 3:
    rcspark.png — stdlib zlib + numpy, all five filters, CRC-checked);
    JPEG is REAL (round 4: rcspark.jpeg — baseline T.81, exact-integer
    IDCT, pinned bit-equal to the independent scripts/jpeg_twin.py
    decoder); WebP lossless is REAL (round 4: rcspark.webp — full VP8L,
    all four transforms + color cache + LZ77 + meta groups, pinned
    bit-equal to scripts/webp_twin.py); GIF is REAL (round 4:
    rcspark.gif — 87a/89a, LZW, interlace, LCTs, transparency +
    disposal compositing, pinned bit-equal to scripts/gif_twin.py).
    Only LOSSY WebP (VP8 chunks) remains the documented seam where
    PIL/cv2 bind on a real cluster."""
    if fmt == "png" or data[:8] == b"\x89PNG\r\n\x1a\n":
        from ..png import decode_png

        return decode_png(data)
    if fmt in ("jpeg", "jpg") or data[:2] == b"\xff\xd8":
        from ..jpeg import decode_jpeg

        return decode_jpeg(data)
    if fmt == "webp" or (data[:4] == b"RIFF" and data[8:12] == b"WEBP"):
        from ..webp import decode_webp

        return decode_webp(data)
    if fmt == "gif" or data[:6] in (b"GIF87a", b"GIF89a"):
        from ..gif import decode_gif

        return decode_gif(data)
    if fmt == "bmp" or data[:2] == b"BM":
        from ..bmp import decode_bmp

        return decode_bmp(data)
    raise NotImplementedError(
        f"external codec for fmt={fmt!r} requires PIL/cv2; bind here on a real cluster"
    )


def _decode(data: bytes) -> np.ndarray:
    pix, _ = decode_image(data)
    return pix


# --------------------------------------------------------------------------
# Quarantine plane (round 5, VERDICT r4 item 2): undecodable arrivals are
# ROUTED, never raised on — a single hostile/lossy byte blob must not kill
# a 10^10-row wave. sniff_format is the magic walk; native_decode is the
# runtime seam that PREFERS an installed native codec (PIL) so the
# pure-Python codecs are the fallback, not the hot path, on real clusters.
# --------------------------------------------------------------------------

def sniff_format(data: bytes) -> str:
    """Container sniff from magic bytes — never raises, 'unknown' for
    anything unrecognized. WebP is split by payload chunk because that is
    the decodability boundary (VP8L = lossless = decodable here)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        chunk = data[12:16]
        if chunk == b"VP8L":
            return "webp_vp8l"
        if chunk == b"VP8 ":
            return "webp_vp8"
        if chunk == b"VP8X":
            return "webp_vp8x"
        return "webp_unknown"
    if data[:2] in (b"P6", b"Q6"):
        return "ppm" if data[:2] == b"P6" else "qppm"
    return "unknown"


def native_decode(data: bytes):
    """Runtime native-codec seam: decode via PIL when it is importable
    (real clusters), else None (this sandbox). Success returns an RGB(A)
    uint8 array; ANY failure returns None so the pure-Python codecs — and
    ultimately the quarantine route — still apply."""
    try:
        import io

        from PIL import Image  # noqa: F401 — absent in the sandbox
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


def decode_or_quarantine(data: bytes) -> tuple["np.ndarray | None", str, "str | None"]:
    """(pixels | None, fmt_sniffed, quarantine_reason | None).

    Route taxonomy (coarse on purpose — stable across codec versions):
    - None: decoded fine (native seam first, pure-Python codecs second)
    - 'unsupported_codec': recognized container, no decoder in this
      runtime (lossy/extended WebP without PIL)
    - 'corrupt': recognized container, decode failed (truncation, bad
      CRC, hostile lengths)
    - 'unknown_format': no recognized magic
    """
    fmt = sniff_format(data)
    if fmt == "unknown":
        return None, fmt, "unknown_format"
    pix = native_decode(data)
    if pix is not None:
        return pix, fmt, None
    try:
        if fmt in ("ppm", "qppm"):
            return decode_image(data)[0], fmt, None
        return decode_external(data, fmt), fmt, None
    except NotImplementedError:
        return None, fmt, "unsupported_codec"
    except Exception:
        return None, fmt, "corrupt"


QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fmt_sniffed", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("quarantine_reason", T.StringType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
    ]
)


def media_quarantine(ids: DataFrame) -> DataFrame:
    """A16 arrival hygiene: decode-or-route over a mixed wire batch
    (5 real encodings + lossy/extended WebP stubs + truncated PNG +
    garbage, rcspark.fixtures.make_mixed_arrival). Per arrival:
    (fmt_sniffed, decode_ok, quarantine_reason, dims). Input needs
    (image_id, cls); bytes are synthesized in the Arrow batch (codec-twin
    pattern — the oracle twin re-sniffs the same bytes independently)."""
    from ..fixtures import make_mixed_arrival

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, cls in zip(pdf["image_id"], pdf["cls"]):
                data = make_mixed_arrival(iid, int(cls))
                pix, fmt, reason = decode_or_quarantine(data)
                out.append(
                    (
                        iid, fmt, reason is None, reason,
                        None if pix is None else int(pix.shape[1]),
                        None if pix is None else int(pix.shape[0]),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in QUARANTINE_SCHEMA.fields]
            )

    return ids.select("image_id", "cls").mapInPandas(run, QUARANTINE_SCHEMA)


def parse_image_header(data: bytes) -> tuple[str, "int | None", "int | None"]:
    """Decode-FREE dimension probe — the img2dataset pre-decode step: read
    (fmt, w, h) from container headers alone, touching only the first few
    hundred bytes. Dims come back None when the container carries no
    frame header this runtime can validate (lossy/extended WebP stubs) or
    the header itself is damaged. Never raises.

    Notably, a PNG truncated mid-IDAT still yields its IHDR dims here
    while decode_or_quarantine routes it 'corrupt' — the probe lets the
    scheduler budget/bucket an arrival before spending a decode on it.
    """
    fmt = sniff_format(data)
    try:
        if fmt == "png" and len(data) >= 24 and data[12:16] == b"IHDR":
            return (fmt, int.from_bytes(data[16:20], "big"),
                    int.from_bytes(data[20:24], "big"))
        if fmt == "jpeg":
            i = 2
            while i + 9 <= len(data) and data[i] == 0xFF:
                marker = data[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # baseline/ext/progressive SOF
                    return (fmt, int.from_bytes(data[i + 7:i + 9], "big"),
                            int.from_bytes(data[i + 5:i + 7], "big"))
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg = int.from_bytes(data[i + 2:i + 4], "big")
                if seg < 2:
                    break
                i += 2 + seg
        elif fmt == "gif" and len(data) >= 10:
            return (fmt, int.from_bytes(data[6:8], "little"),
                    int.from_bytes(data[8:10], "little"))
        elif fmt == "bmp" and len(data) >= 26:
            w = int.from_bytes(data[18:22], "little", signed=True)
            h = int.from_bytes(data[22:26], "little", signed=True)
            return fmt, abs(w), abs(h)
        elif fmt == "webp_vp8l" and len(data) >= 25 and data[20] == 0x2F:
            b = int.from_bytes(data[21:25], "little")
            return fmt, (b & 0x3FFF) + 1, ((b >> 14) & 0x3FFF) + 1
    except Exception:
        pass
    return fmt, None, None


HEADER_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("probe_fmt", T.StringType(), False),
        T.StructField("probe_w", T.IntegerType(), True),
        T.StructField("probe_h", T.IntegerType(), True),
        T.StructField("dims_available", T.BooleanType(), False),
    ]
)


def header_probe(ids: DataFrame) -> DataFrame:
    """Header-only (fmt, w, h) probe over the mixed wire batch — same
    arrival fixture as media_quarantine so the two operators' contrast is
    testable (trunc_png: dims HERE, 'corrupt' THERE). Arrow-batched
    mapInPandas; input needs (image_id, cls)."""
    from ..fixtures import make_mixed_arrival

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, cls in zip(pdf["image_id"], pdf["cls"]):
                fmt, w, h = parse_image_header(make_mixed_arrival(iid, int(cls)))
                out.append((iid, fmt, w, h, w is not None))
            yield pd.DataFrame(
                out, columns=[f.name for f in HEADER_PROBE_SCHEMA.fields]
            )

    return ids.select("image_id", "cls").mapInPandas(run, HEADER_PROBE_SCHEMA)


DIHEDRAL_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("item_id", T.StringType(), False),
        T.StructField("phash_plain", T.LongType(), False),
        T.StructField("dihedral_key", T.LongType(), False),
    ]
)

_DIHEDRAL_PLANTS = ("rot90", "rot180", "rot270", "fliplr", "flipud")


def dihedral_key(pix) -> int:
    """min over the 8 dihedral transforms of phash64 — a rotation/flip-
    INVARIANT dedup key: for any g in D4, the transform set of g(I) is the
    transform set of I, so the min is EXACTLY equal (no hamming tolerance
    needed; decode and rotation are both lossless)."""
    from ..codecs import phash64

    best = None
    for t in range(4):
        p = np.rot90(pix, t)
        for q in (p, np.fliplr(p)):
            v = phash64(np.ascontiguousarray(q))
            if best is None or v < best:
                best = v
    return best


def dihedral_phash(ids: DataFrame) -> DataFrame:
    """A17 rotation-invariant tier [U imagededup / milvus rotation-robust
    pHash practice]: emit each original (o:) and, for planted ids, one
    rotated/flipped copy (r:) with (plain phash, dihedral key). Plain
    phash differs across the plant; the dihedral key matches exactly —
    the group-by-key dedup that catches rotated reposts exact/cheap.
    Input needs (image_id, rot_cls); rot_cls 0 = no plant, 1..5 pick the
    transform."""
    from ..codecs import phash64
    from ..fixtures import make_smooth_image

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, rc in zip(pdf["image_id"], pdf["rot_cls"]):
                pix = make_smooth_image(iid)
                out.append((iid, "o:" + iid, phash64(pix), dihedral_key(pix)))
                rc = int(rc)
                if rc:
                    kind = _DIHEDRAL_PLANTS[rc - 1]
                    if kind == "rot90":
                        q = np.rot90(pix, 1)
                    elif kind == "rot180":
                        q = np.rot90(pix, 2)
                    elif kind == "rot270":
                        q = np.rot90(pix, 3)
                    elif kind == "fliplr":
                        q = np.fliplr(pix)
                    else:
                        q = np.flipud(pix)
                    q = np.ascontiguousarray(q)
                    out.append((iid, "r:" + iid, phash64(q), dihedral_key(q)))
            yield pd.DataFrame(
                out, columns=[f.name for f in DIHEDRAL_SCHEMA.fields]
            )

    return ids.select("image_id", "rot_cls").mapInPandas(run, DIHEDRAL_SCHEMA)


CLIP_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("clip_idx", T.IntegerType(), False),
        T.StructField("start_frame", T.IntegerType(), False),
        T.StructField("end_frame", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("n_clips", T.IntegerType(), False),
        T.StructField("rep_phash", T.LongType(), False),
    ]
)


def video_clip_windows(
    ids: DataFrame, clip_len: int = 8, stride: int = 4, id_col: str = "video_id"
) -> DataFrame:
    """Video-training clip sampler [U video-LLM pretraining practice
    (fixed-length clip windows, strided)]: full windows of `clip_len`
    frames every `stride`, each with its middle frame's phash as the
    representative thumbnail key (the clip-level dedup handle). Videos
    shorter than a window emit nothing (dropped, not padded). One
    Arrow-batched decode per video."""
    from ..codecs import phash64

    videos = synthesize_videos(ids, id_col=id_col)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import decode_video as _dec

        for pdf in batches:
            out = []
            for vid, data, n in zip(pdf["video_id"], pdf["bytes"],
                                    pdf["n_frames"]):
                n = int(n)
                if n < clip_len:
                    continue
                frames = _dec(bytes(data))
                n_clips = (n - clip_len) // stride + 1
                for c in range(n_clips):
                    s = c * stride
                    rep = phash64(frames[s + clip_len // 2])
                    out.append((vid, c, s, s + clip_len, n, n_clips, rep))
            yield pd.DataFrame(
                out, columns=[f.name for f in CLIP_WINDOW_SCHEMA.fields]
            )

    return videos.mapInPandas(run, CLIP_WINDOW_SCHEMA)


BOMB_MAX_PIXELS = 50_000_000  # the PIL MAX_IMAGE_PIXELS-style ceiling
BOMB_MAX_RATIO = 1000         # declared-raw-bytes : container-bytes

BOMB_GATE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("nbytes", T.LongType(), False),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("pixels", T.LongType(), True),
        T.StructField("flag_reason", T.StringType(), True),
        T.StructField("admitted", T.BooleanType(), False),
    ]
)


def bomb_gate(ids: DataFrame) -> DataFrame:
    """Decompression-bomb defense [U PIL MAX_IMAGE_PIXELS; img2dataset
    guards]: admit an arrival only when its header-DECLARED pixel count
    and declared-raw-to-container byte ratio are sane — runs on the
    header probe alone, before any decode allocates w·h·3 bytes.
    First-failing order: too_many_pixels → suspicious_ratio. Arrivals
    whose header yields no dims are admitted here (the quarantine route
    owns undecodables). Input needs (image_id, cls)."""
    from ..fixtures import make_bomb_arrival

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, cls in zip(pdf["image_id"], pdf["cls"]):
                data = make_bomb_arrival(iid, int(cls))
                _, w, h = parse_image_header(data)
                px = None if w is None else w * h
                if px is not None and px > BOMB_MAX_PIXELS:
                    reason = "too_many_pixels"
                elif px is not None and px * 3 > BOMB_MAX_RATIO * len(data):
                    reason = "suspicious_ratio"
                else:
                    reason = None
                out.append((iid, len(data), w, h, px, reason, reason is None))
            yield pd.DataFrame(
                out, columns=[f.name for f in BOMB_GATE_SCHEMA.fields]
            )

    return ids.select("image_id", "cls").mapInPandas(run, BOMB_GATE_SCHEMA)


def image_features(images: DataFrame) -> DataFrame:
    """(image_id, bytes) → decoded metadata + channel means + phash.

    Input needs only (image_id, bytes); everything else is derived from the
    decoded pixels (so this doubles as a metadata integrity checker).
    """
    src = images.select("image_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, fmt = decode_image(bytes(data))
                # exact int sums -> one IEEE division: bit-reproducible, so
                # the independent expected-values twin (scripts/
                # gen_media_expected.py) and the driver's oracle hash agree
                sums = pix.reshape(-1, 3).astype(np.int64).sum(axis=0)
                npx = pix.shape[0] * pix.shape[1]
                out.append(
                    (
                        iid,
                        pix.shape[1],
                        pix.shape[0],
                        fmt,
                        round(float(sums[0] / npx), 4),
                        round(float(sums[1] / npx), 4),
                        round(float(sums[2] / npx), 4),
                        phash64(pix),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return src.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def block_mean_resize(pix: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic block-mean downsample (the no-PIL 'resize')."""
    h, w, _ = pix.shape
    ys = np.linspace(0, h, out_h + 1, dtype=np.int64)
    xs = np.linspace(0, w, out_w + 1, dtype=np.int64)
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            block = pix[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            out[i, j] = block.reshape(-1, 3).mean(axis=0).astype(np.uint8)
    return out


def resize_images(images: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """(image_id, bytes) → block-mean thumbnails re-encoded as PPM.

    `psnr_db` is NULL for thumbnails (size changed); it is populated by
    `reencode_lossy` below where the fidelity contract applies.
    """
    src = images.select("image_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                thumb = block_mean_resize(pix, out_h, out_w)
                out.append((iid, out_w, out_h, encode_ppm(thumb), None))
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return src.mapInPandas(run, RESIZED_SCHEMA)


def reencode_lossy(images: DataFrame) -> DataFrame:
    """(image_id, bytes) → QPPM re-encode + measured PSNR vs the source.

    The north rule's fidelity gate (PSNR ≥ 40 dB for lossy) is checked on
    exactly this path in tests/test_datapipe.py.
    """
    src = images.select("image_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                enc = encode_qppm(pix)
                dec, _ = decode_image(enc)
                p = psnr(pix, dec)
                out.append(
                    (iid, pix.shape[1], pix.shape[0], enc, round(float(min(p, 99.0)), 4))
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return src.mapInPandas(run, RESIZED_SCHEMA)


JPEG_RT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_jpeg_bytes", T.LongType(), False),
        T.StructField("sse", T.LongType(), False),
        T.StructField("psnr40_ok", T.BooleanType(), False),
    ]
)


def jpeg_roundtrip(ids: DataFrame, quality: int = 90) -> DataFrame:
    """A16 store-as-JPEG audit ([U scrapy/pipelines/images.py] converts
    stored images to JPEG): encode the shared smooth fixture image to REAL
    baseline JPEG (rcspark.jpeg), decode it back, report size + fidelity.

    The north rule's PSNR ≥ 40 dB lossy gate is emitted as the exact
    integer predicate sse·10⁴ ≤ npx·255² (psnr ≥ 40 ⟺ mse ≤ 255²/10⁴), so
    every output column is an exact integer/boolean and the
    independent-twin expected parquet (scripts/gen_media_expected.py
    decoding the same bytes with scripts/jpeg_twin.py's scalar decoder)
    hash-matches bit-for-bit."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..jpeg import decode_jpeg, encode_jpeg

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                data = encode_jpeg(pix, quality=quality)
                dec = decode_jpeg(data)
                diff = dec.astype(np.int64) - pix.astype(np.int64)
                sse = int((diff * diff).sum())
                npx = pix.shape[0] * pix.shape[1] * 3
                out.append(
                    (iid, pix.shape[1], pix.shape[0], len(data), sse,
                     sse * 10_000 <= npx * 65_025)
                )
            yield pd.DataFrame(out, columns=[f.name for f in JPEG_RT_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, JPEG_RT_SCHEMA)


SSIM_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("quality", T.IntegerType(), False),
        T.StructField("n_blocks", T.LongType(), False),
        T.StructField("ssim_ppm", T.LongType(), False),
        T.StructField("ssim_ok", T.BooleanType(), False),
    ]
)

SSIM_MIN_PPM = 990_000  # curation floor (fixture spread 969k-999k)

# Exact-integer SSIM contract (the twin re-derives it scalar-wise; any
# independent implementation following these rules is bit-equal):
#   luma   y = (77 R + 150 G + 29 B) >> 8               (BT.601 integer)
#   blocks non-overlapping 8x8 over the luma plane (fixture dims are
#          multiples of 8; a general image crops the ragged edge)
#   per block, n = 64, with integer sums Sx Sy Sxx Syy Sxy and the SSIM
#   constants C1 = (0.01*255)^2, C2 = (0.03*255)^2 cleared to integers by
#   S = 10^4 (C1*S = 65025, C2*S = 585225):
#     N1 = S*2*Sx*Sy + 65025*n^2       D1 = S*(Sx^2 + Sy^2) + 65025*n^2
#     N2 = S*2*(n*Sxy - Sx*Sy) + 585225*n^2
#     D2 = S*((n*Sxx - Sx^2) + (n*Syy - Sy^2)) + 585225*n^2
#     block_ppm = (10^6 * N1 * N2) // (D1 * D2)   (Python big-int floor —
#                  covariance can be negative, floor is toward -inf)
#   ssim_ppm = sum(block_ppm) // n_blocks
# The products reach ~10^25, so the per-block finish runs on PYTHON ints
# over the numpy-reduced block sums (5 ints per block — not a per-pixel
# loop; the per-image block count is bounded by the thumbnail-scale gate
# input, and at corpus scale this is Arrow-batched inside mapInPandas).


def _ssim_ppm_exact(orig: np.ndarray, dec: np.ndarray) -> tuple[int, int]:
    def luma(p: np.ndarray) -> np.ndarray:
        q = p.astype(np.int64)
        return (77 * q[..., 0] + 150 * q[..., 1] + 29 * q[..., 2]) >> 8

    x, y = luma(orig), luma(dec)
    h, w = x.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        raise ValueError(f"SSIM needs >= 8x8 pixels, got {h}x{w}")

    def bsum(a: np.ndarray) -> np.ndarray:
        return a[: bh * 8, : bw * 8].reshape(bh, 8, bw, 8).sum(axis=(1, 3))

    sums = map(bsum, (x, y, x * x, y * y, x * y))
    n, c1, c2, s = 64, 65025, 585225, 10_000
    total = 0
    for sx, sy, sxx, syy, sxy in zip(*(a.flat for a in sums)):
        sx, sy, sxx, syy, sxy = (int(v) for v in (sx, sy, sxx, syy, sxy))
        n1 = s * 2 * sx * sy + c1 * n * n
        d1 = s * (sx * sx + sy * sy) + c1 * n * n
        n2 = s * 2 * (n * sxy - sx * sy) + c2 * n * n
        d2 = s * ((n * sxx - sx * sx) + (n * syy - sy * sy)) + c2 * n * n
        total += (1_000_000 * n1 * n2) // (d1 * d2)
    return total // (bh * bw), bh * bw


def ssim_gate(ids: DataFrame, min_ppm: int = SSIM_MIN_PPM) -> DataFrame:
    """A16 perceptual-fidelity curation gate: SSIM (Wang et al. 2004)
    between the original pixels and their store-as-JPEG roundtrip, under
    the exact-integer contract above — PSNR (img_jpeg_roundtrip) measures
    pointwise error, SSIM adds the luminance/contrast/structure terms
    curation pipelines actually gate on. Per-id quality
    30 + (xxh64 >> 24) % 61 spans the fixture spread so both verdict
    classes occur at min_ppm."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..jpeg import decode_jpeg, encode_jpeg
    from ..xxh import xxh64

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                q = 30 + ((xxh64(iid.encode()) >> 24) % 61)
                pix = make_smooth_image(iid)
                dec = decode_jpeg(encode_jpeg(pix, quality=q))
                ppm, nb = _ssim_ppm_exact(pix, dec)
                out.append(
                    (iid, pix.shape[1], pix.shape[0], q, nb, ppm, ppm >= min_ppm)
                )
            yield pd.DataFrame(out, columns=[f.name for f in SSIM_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, SSIM_SCHEMA)


JPEG_QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("true_q", T.IntegerType(), False),
        T.StructField("est_q", T.IntegerType(), False),
        T.StructField("dqt_dist", T.LongType(), False),
        T.StructField("keep", T.BooleanType(), False),
    ]
)


def estimate_jpeg_quality(data: bytes) -> tuple[int, int]:
    """(est_q, dist): read the luminance DQT back out of JPEG bytes and
    find the IJG quality whose Annex-K scaling is nearest (L1 over the 64
    coefficients; lowest q wins ties; dist 0 = exact table match). The
    LAION-style curation gate: corpora drop images stored below a quality
    floor, and the stored quantization table is the honest signal for it
    (metadata lies, DQT can't)."""
    import struct as _s

    from ..jpeg import ZIGZAG, quality_tables

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i, n = 2, len(data)
    tbl = None
    while i < n - 3:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):
            break
        seglen = _s.unpack(">H", data[i + 2 : i + 4])[0]
        if marker == 0xDB:
            seg = data[i + 4 : i + 2 + seglen]
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                step = 128 if pq else 64
                if tq == 0:  # luminance table, zigzag order
                    vals = (
                        list(seg[p + 1 : p + 65])
                        if pq == 0
                        else [
                            (seg[p + 1 + 2 * j] << 8) | seg[p + 2 + 2 * j]
                            for j in range(64)
                        ]
                    )
                    nat = [0] * 64
                    for zi, pos in enumerate(ZIGZAG):
                        nat[pos] = vals[zi]
                    tbl = nat
                p += 1 + step
        i += 2 + seglen
    if tbl is None:
        raise ValueError("no luminance DQT found")
    best_q, best_d = -1, None
    for q in range(1, 101):
        cand = quality_tables(q)[0].reshape(64)
        d = int(sum(abs(int(cand[j]) - tbl[j]) for j in range(64)))
        if best_d is None or d < best_d:
            best_q, best_d = q, d
        if d == 0:
            break  # lowest exactly-matching q wins
    return best_q, best_d


def jpeg_quality_gate(ids: DataFrame, q_floor: int = 60) -> DataFrame:
    """Per id: encode the smooth fixture at an id-derived quality
    (35..95), read the DQT back with estimate_jpeg_quality, and gate at
    ``q_floor``. est_q must recover true_q exactly (dist 0) — pinned by
    the independent expected parquet, whose twin re-parses the DQT with
    its own scalar code."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..jpeg import encode_jpeg
    from ..xxh import xxh64

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                true_q = 35 + xxh64(iid.encode()) % 61
                data = encode_jpeg(make_smooth_image(iid), quality=true_q)
                est_q, dist = estimate_jpeg_quality(data)
                out.append((iid, true_q, est_q, dist, est_q >= q_floor))
            yield pd.DataFrame(
                out, columns=[f.name for f in JPEG_QUALITY_SCHEMA.fields]
            )

    return ids.select("image_id").mapInPandas(run, JPEG_QUALITY_SCHEMA)


WEBP_RT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_webp_bytes", T.LongType(), False),
        T.StructField("enc_mode", T.StringType(), False),
        T.StructField("exact", T.BooleanType(), False),
    ]
)


def webp_roundtrip(ids: DataFrame) -> DataFrame:
    """A16 store-as-WebP audit: encode the shared smooth fixture to REAL
    lossless WebP (rcspark.webp, VP8L — deterministic bytes, auto mode
    choice), decode it back, report size + mode + exact-roundtrip flag.

    Lossless means ``exact`` must be True for every row — but the column
    is COMPUTED (decode-and-compare), not asserted: the expected parquet
    twin (scripts/gen_media_expected.py) re-decodes the same bytes with
    the independent scalar scripts/webp_twin.py decoder, so a defect in
    either decoder (or the encoder) breaks the hash match."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..webp import decode_webp, encode_webp_auto

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                data, mode = encode_webp_auto(pix)
                dec = decode_webp(data)
                exact = bool(
                    np.array_equal(dec[:, :, :3], pix) and (dec[:, :, 3] == 255).all()
                )
                out.append(
                    (iid, pix.shape[1], pix.shape[0], len(data), mode, exact)
                )
            yield pd.DataFrame(out, columns=[f.name for f in WEBP_RT_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, WEBP_RT_SCHEMA)


TRANSCODE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_webp_bytes", T.LongType(), False),
        T.StructField("n_jpeg_bytes", T.LongType(), False),
        T.StructField("webp_exact", T.BooleanType(), False),
        T.StructField("sse", T.LongType(), False),
        T.StructField("psnr40_ok", T.BooleanType(), False),
    ]
)


def webp_to_jpeg_transcode(ids: DataFrame, quality: int = 90) -> DataFrame:
    """A16 ingest-to-store transcode — the literal ImagesPipeline behavior
    ([U scrapy/pipelines/images.py] `convert_image` re-encodes whatever
    arrives to JPEG): the source is stored as REAL lossless WebP
    (rcspark.webp), the pipeline decodes it and re-encodes to REAL
    baseline JPEG (rcspark.jpeg), and fidelity is judged against the
    ORIGINAL pixels — the whole decode→encode→decode chain sits under one
    gate.

    `webp_exact` must be True (lossless leg) and `psnr40_ok` carries the
    north rule's lossy floor as the exact integer predicate
    sse·10⁴ ≤ npx·255²; both are COMPUTED, never asserted. The expected
    parquet twin (scripts/gen_media_expected.py) re-decodes the same WebP
    bytes with the independent scripts/webp_twin.py decoder and the same
    JPEG bytes with scripts/jpeg_twin.py, so a defect in either encoder
    or any of the four decoders breaks the driver's hash match."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..jpeg import decode_jpeg, encode_jpeg
    from ..webp import decode_webp, encode_webp_auto

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                wdata, _ = encode_webp_auto(pix)
                dec_w = decode_webp(wdata)
                webp_exact = bool(
                    np.array_equal(dec_w[:, :, :3], pix)
                    and (dec_w[:, :, 3] == 255).all()
                )
                jdata = encode_jpeg(dec_w[:, :, :3], quality=quality)
                dec_j = decode_jpeg(jdata)
                diff = dec_j.astype(np.int64) - pix.astype(np.int64)
                sse = int((diff * diff).sum())
                npx = pix.shape[0] * pix.shape[1] * 3
                out.append(
                    (
                        iid,
                        pix.shape[1],
                        pix.shape[0],
                        len(wdata),
                        len(jdata),
                        webp_exact,
                        sse,
                        sse * 10_000 <= npx * 65_025,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in TRANSCODE_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, TRANSCODE_SCHEMA)


THUMB_SIZES: tuple[tuple[str, int, int], ...] = (("small", 8, 8), ("big", 16, 16))

THUMBS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("thumb", T.StringType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("n_jpeg_bytes", T.LongType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("sse", T.LongType(), False),
    ]
)


def fit_box(w: int, h: int, tw: int, th: int) -> tuple[int, int]:
    """Aspect-preserving fit into (tw, th) — PIL Image.thumbnail
    semantics in exact integer arithmetic (floor, min 1px)."""
    if w * th <= h * tw:  # height-bound
        return max(1, (w * th) // h), th
    return tw, max(1, (h * tw) // w)


def int_block_mean(pix: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Block-mean downsample with EXACT integer division (sum // count) —
    unlike block_mean_resize's float mean, this is trivially restatable
    by the scalar twin, so thumbnails can sit under the driver hash.
    Block boundaries are exact integer floors (h*i//out_h) — NOT
    linspace float truncation, which disagrees with floor on non-dyadic
    sizes (e.g. h=122, out_h=14 truncates 60.999… to 60 vs floor 61)."""
    h, w, _ = pix.shape
    ys = (h * np.arange(out_h + 1, dtype=np.int64)) // out_h
    xs = (w * np.arange(out_w + 1, dtype=np.int64)) // out_w
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            block = pix[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].reshape(-1, 3)
            out[i, j] = block.astype(np.int64).sum(axis=0) // block.shape[0]
    return out


def thumbs_pipeline(ids: DataFrame, quality: int = 85) -> DataFrame:
    """IMAGES_THUMBS parity ([U scrapy/pipelines/images.py] writes one
    JPEG thumbnail per configured size beside every stored image): each
    source image fans out into aspect-fit integer block-mean thumbnails
    re-encoded as REAL baseline JPEG. Emitted channel sums are over the
    DECODED-JPEG thumbnail pixels (exact int64 — decode-sensitive at any
    thumb size, where an 8×8 phash degenerates below 8px) and sse is the
    decoded-vs-pre-encode fidelity, so the whole resize→encode→decode
    chain sits under the driver hash; the expected parquet twin restates
    the fit arithmetic and block means scalar-wise and re-decodes the
    same bytes with scripts/jpeg_twin.py."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..jpeg import decode_jpeg, encode_jpeg

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                h, w, _ = pix.shape
                for name, tw, th in THUMB_SIZES:
                    ow, oh = fit_box(w, h, tw, th)
                    thumb = int_block_mean(pix, oh, ow)
                    data = encode_jpeg(thumb, quality=quality)
                    dec = decode_jpeg(data)
                    s = dec.reshape(-1, 3).astype(np.int64).sum(axis=0)
                    diff = dec.astype(np.int64) - thumb.astype(np.int64)
                    out.append(
                        (iid, name, ow, oh, len(data),
                         int(s[0]), int(s[1]), int(s[2]),
                         int((diff * diff).sum()))
                    )
            yield pd.DataFrame(out, columns=[f.name for f in THUMBS_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, THUMBS_SCHEMA)


def apply_exif_orientation(pix: np.ndarray, orientation: int) -> np.ndarray:
    """[U PIL ImageOps.exif_transpose] semantics: transform the STORED
    pixels so the result displays upright. numpy slicing formulation (the
    twin uses per-pixel source-index mapping)."""
    if orientation == 1:
        return pix
    if orientation == 2:
        return pix[:, ::-1]
    if orientation == 3:
        return pix[::-1, ::-1]
    if orientation == 4:
        return pix[::-1]
    if orientation == 5:
        return pix.transpose(1, 0, 2)
    if orientation == 6:
        return np.rot90(pix, 3)
    if orientation == 7:
        return pix[::-1, ::-1].transpose(1, 0, 2)
    if orientation == 8:
        return np.rot90(pix, 1)
    raise ValueError(f"EXIF orientation {orientation} outside 1..8")


EXIF_ORIENT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("orientation", T.IntegerType(), False),
        T.StructField("stored_w", T.IntegerType(), False),
        T.StructField("stored_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def exif_autoorient(ids: DataFrame, quality: int = 90) -> DataFrame:
    """A16 EXIF auto-orientation — the ImagesPipeline ingest step PIL's
    exif_transpose performs: cameras store sensor-rotated pixels plus an
    Orientation tag, and a corpus that ignores it trains on sideways
    images. The fixture plants orientation 1+xxh64(id)%8 into a REAL
    Exif APP1 (rcspark.jpeg); the operator re-reads the tag FROM THE
    BYTES (never trusts the generator), decodes, applies the upright
    transform, and emits the oriented dimensions + oriented phash (the
    phash is flip/rotation-sensitive, so a wrong transform breaks the
    hash; plain channel sums would not). Twin: scripts/
    gen_media_expected.py re-reads the tag with its own marker walk and
    re-orients with per-pixel source-index mapping."""
    import pandas as pd

    from ..codecs import phash64
    from ..fixtures import make_smooth_image
    from ..jpeg import decode_jpeg, encode_jpeg, read_exif_orientation
    from ..xxh import xxh64

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                planted = 1 + xxh64(iid.encode()) % 8
                data = encode_jpeg(pix, quality=quality, exif_orientation=planted)
                o = read_exif_orientation(data)
                dec = decode_jpeg(data)
                up = np.ascontiguousarray(apply_exif_orientation(dec, o))
                out.append(
                    (
                        iid,
                        o,
                        dec.shape[1],
                        dec.shape[0],
                        up.shape[1],
                        up.shape[0],
                        phash64(up),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in EXIF_ORIENT_SCHEMA.fields]
            )

    return ids.select("image_id").mapInPandas(run, EXIF_ORIENT_SCHEMA)


GIF_RT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_gif_bytes", T.LongType(), False),
        T.StructField("pal_mode", T.StringType(), False),
        T.StructField("exact", T.BooleanType(), False),
    ]
)


def gif_roundtrip(ids: DataFrame) -> DataFrame:
    """A16 store-as-GIF audit: encode the shared smooth fixture to REAL
    GIF89a (rcspark.gif — real variable-width LZW, deterministic palette),
    decode it back, report size + palette mode + exact-contract flag.

    The contract is two-tier: `exact` palettes (≤256 distinct colors)
    must roundtrip losslessly; truecolor images go through the fixed
    3-3-2 palette and must decode to quantize_332(pixels) EXACTLY. The
    flag is COMPUTED (decode-and-compare), and the expected parquet twin
    (scripts/gen_media_expected.py) re-decodes the same bytes with the
    independent scalar scripts/gif_twin.py decoder and restates the
    quantization with its own scalar formula — a defect in encoder,
    either decoder, or either quantizer breaks the driver's hash."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..gif import decode_gif, encode_gif, quantize_332

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                data, mode = encode_gif(pix)
                dec = decode_gif(data)
                want = pix if mode == "exact" else quantize_332(pix)
                out.append(
                    (iid, pix.shape[1], pix.shape[0], len(data), mode,
                     bool(np.array_equal(dec, want)))
                )
            yield pd.DataFrame(out, columns=[f.name for f in GIF_RT_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, GIF_RT_SCHEMA)


GIF_TRANSCODE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_gif_bytes", T.LongType(), False),
        T.StructField("n_jpeg_bytes", T.LongType(), False),
        T.StructField("pal_mode", T.StringType(), False),
        T.StructField("gif_exact", T.BooleanType(), False),
        T.StructField("sse", T.LongType(), False),
        T.StructField("psnr40_ok", T.BooleanType(), False),
    ]
)


def gif_to_jpeg_transcode(ids: DataFrame, quality: int = 90) -> DataFrame:
    """A16 ingest-to-store transcode for GIF uploads — the literal
    ImagesPipeline behavior ([U scrapy/pipelines/images.py]
    `convert_image` re-encodes GIF arrivals to JPEG): the source is
    stored as REAL GIF89a (rcspark.gif), the pipeline decodes it and
    re-encodes to REAL baseline JPEG (rcspark.jpeg).

    Fidelity is judged against the DECODED GIF pixels (what arrived —
    for a palette format the palette image IS the ingested truth; the
    palette leg has its own exact contract via `gif_exact`), with the
    north rule's PSNR ≥ 40 dB floor as the exact integer predicate
    sse·10⁴ ≤ npx·255². Measured finding the gate surfaces honestly:
    3-3-2 palette banding turns smooth gradients into step edges that
    baseline JPEG q90 reproduces at only ~31-33 dB, so most
    truecolor-sourced GIFs FAIL the photographic floor (exact-palette
    GIFs pass) — exactly the signal a curation pipeline needs before
    storing GIF-sourced photos. The expected parquet twin re-decodes
    the GIF bytes with scripts/gif_twin.py and the JPEG bytes with
    scripts/jpeg_twin.py — four independent decoder legs under one
    driver hash."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..gif import decode_gif, encode_gif, quantize_332
    from ..jpeg import decode_jpeg, encode_jpeg

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                gdata, mode = encode_gif(pix)
                dec_g = decode_gif(gdata)
                want = pix if mode == "exact" else quantize_332(pix)
                gif_exact = bool(np.array_equal(dec_g, want))
                jdata = encode_jpeg(dec_g, quality=quality)
                dec_j = decode_jpeg(jdata)
                diff = dec_j.astype(np.int64) - dec_g.astype(np.int64)
                sse = int((diff * diff).sum())
                npx = pix.shape[0] * pix.shape[1] * 3
                out.append(
                    (
                        iid,
                        pix.shape[1],
                        pix.shape[0],
                        len(gdata),
                        len(jdata),
                        mode,
                        gif_exact,
                        sse,
                        sse * 10_000 <= npx * 65_025,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in GIF_TRANSCODE_SCHEMA.fields]
            )

    return ids.select("image_id").mapInPandas(run, GIF_TRANSCODE_SCHEMA)


GIF_ANIM_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("n_gif_bytes", T.LongType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("exact", T.BooleanType(), False),
    ]
)


def gif_animation_frames(ids: DataFrame) -> DataFrame:
    """Animated-GIF frame extraction (A16 × video_frame_sample's shape):
    the shot-structured frame stack (shared make_shot_frames generator)
    is encoded as ONE animated GIF89a (per-frame GCE, global palette) and
    decoded back into per-frame rows — binary in, exploded frame rows
    out, exactly the mapInPandas plumbing a real animated corpus needs.

    Per-frame channel sums are exact int64 (no float crosses the hash)
    and `exact` compares each composited frame against the palette
    contract. Twin: scripts/gen_media_expected.py re-decodes the same
    bytes with scripts/gif_twin.py's per-pixel compositor."""
    import pandas as pd

    from ..fixtures import make_shot_frames
    from ..gif import decode_gif_frames, encode_gif_frames, quantize_332

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                frames = make_shot_frames(iid)
                flist = [np.ascontiguousarray(f) for f in frames]
                data, mode = encode_gif_frames(
                    flist, delays_cs=[4] * len(flist)
                )
                dec = decode_gif_frames(data)
                for i, d in enumerate(dec):
                    want = (
                        flist[i] if mode == "exact" else quantize_332(flist[i])
                    )
                    s = d.reshape(-1, 3).astype(np.int64).sum(axis=0)
                    out.append(
                        (
                            iid,
                            i,
                            len(dec),
                            len(data),
                            int(s[0]),
                            int(s[1]),
                            int(s[2]),
                            bool(np.array_equal(d, want)),
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in GIF_ANIM_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, GIF_ANIM_SCHEMA)


# -- video: opaque binary container + frame sampling -------------------------------
# Container (numpy-only stand-in for mp4/webm): b"RCV1\n<n> <w> <h>\n" +
# n raw RGB frames. Real codecs bind in decode_external; the Spark-side
# plumbing (binary column in, exploded per-frame rows out, Arrow batches)
# is the part that carries.

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),  # frame as PPM
        T.StructField("phash", T.LongType(), False),
    ]
)


def encode_video(frames: np.ndarray) -> bytes:
    """uint8 (n, h, w, 3) → RCV1 container bytes."""
    n, h, w, _ = frames.shape
    return b"RCV1\n%d %d %d\n" % (n, w, h) + frames.tobytes()


def decode_video(data: bytes) -> np.ndarray:
    if data[:5] != b"RCV1\n":
        raise ValueError(f"unknown video magic {data[:5]!r}")
    nl = data.index(b"\n", 5)
    n, w, h = (int(t) for t in data[5:nl].split())
    pix = np.frombuffer(data, dtype=np.uint8, offset=nl + 1, count=n * w * h * 3)
    return pix.reshape(n, h, w, 3)


def synthesize_videos(
    ids: DataFrame, id_col: str = "video_id", max_frames: int = 24
) -> DataFrame:
    """Deterministic video table from an id column: (video_id, bytes,
    n_frames, w, h). Frame content is a pure function of (id, frame_idx)."""
    from ..xxh import xxh64

    out_schema = T.StructType(
        [
            T.StructField("video_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
        ]
    )
    src = ids.select(F.col(id_col).cast("string").alias("video_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid in pdf["video_id"]:
                h64 = xxh64(vid.encode())
                n = 4 + h64 % (max_frames - 3)
                w, h = 16, 16
                rng = np.random.default_rng(h64 & 0xFFFFFFFF)
                frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
                rows.append((vid, encode_video(frames), n, w, h))
            yield pd.DataFrame(
                rows, columns=["video_id", "bytes", "n_frames", "w", "h"]
            )

    return src.mapInPandas(run, out_schema)


def sample_frames(videos: DataFrame, every_k: int = 4) -> DataFrame:
    """(video_id, bytes) → one row per sampled frame (idx 0, k, 2k, …),
    each re-encoded as a standalone PPM with its phash — the
    video-to-training-frames explode. One Arrow batch per task; the
    container bytes never survive past this stage."""
    src = videos.select("video_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                frames = decode_video(bytes(data))
                n, h, w, _ = frames.shape
                for idx in range(0, n, every_k):
                    fr = frames[idx]
                    rows.append(
                        (vid, idx, n, w, h, encode_ppm(fr), phash64(fr))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return src.mapInPandas(run, VIDEO_FRAME_SCHEMA)


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("diff_permille", T.LongType(), False),
        T.StructField("is_cut", T.BooleanType(), False),
    ]
)


def synthesize_shot_videos(ids: DataFrame, id_col: str = "video_id") -> DataFrame:
    """Deterministic shot-structured video table (see
    rcspark.fixtures.make_shot_frames) — the corpus where scene-cut
    detection has real structure to find."""
    from ..fixtures import make_shot_frames

    out_schema = T.StructType(
        [
            T.StructField("video_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
        ]
    )
    src = ids.select(F.col(id_col).cast("string").alias("video_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid in pdf["video_id"]:
                frames = make_shot_frames(vid)
                rows.append((vid, encode_video(frames), frames.shape[0]))
            yield pd.DataFrame(rows, columns=["video_id", "bytes", "n_frames"])

    return src.mapInPandas(run, out_schema)


def scene_cuts(videos: DataFrame, threshold_permille: int = 150) -> DataFrame:
    """(video_id, bytes) → one row per CONSECUTIVE FRAME PAIR with the
    exact-integer mean-absolute-difference in permille of full scale and
    the cut flag — the shot-boundary detector a video curation pipeline
    runs before per-shot frame sampling.

    diff_permille = 1000 * Σ|a-b| // (h*w*3*255): pure int64, so the
    independent twin reproduces it bit-for-bit. Arrow-batched mapInPandas;
    container bytes are consumed inside the task (never shuffled)."""
    src = videos.select("video_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                frames = decode_video(bytes(data)).astype(np.int64)
                n, h, w, _ = frames.shape
                denom = h * w * 3 * 255
                for i in range(1, n):
                    mad = int(np.abs(frames[i] - frames[i - 1]).sum())
                    dpm = (1000 * mad) // denom
                    rows.append((vid, i, dpm, dpm >= threshold_permille))
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCENE_CUT_SCHEMA.fields]
            )

    return src.mapInPandas(run, SCENE_CUT_SCHEMA)


KEYFRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("shot_id", T.IntegerType(), False),
        T.StructField("start_idx", T.IntegerType(), False),
        T.StructField("end_idx", T.IntegerType(), False),
        T.StructField("key_idx", T.IntegerType(), False),
        T.StructField("key_lap_energy", T.LongType(), False),
    ]
)


def keyframe_select(videos: DataFrame, threshold_permille: int = 150) -> DataFrame:
    """Per-shot keyframe selection — the step after scene cutting that a
    video-curation pipeline stores per shot ([U ffmpeg thumbnail filter /
    katna keyframes]): segment frames into shots with the SAME
    exact-integer MAD cut rule as scene_cuts, then elect the sharpest
    frame per shot by Laplacian energy (the sharpness_features formula:
    luma = r+g+b, 4-neighbor interior Laplacian, Σ lap²), ties broken
    toward the earliest frame. All int64, so the independent twin
    (scripts/gen_media_expected.py — scalar per-pixel Laplacian, its own
    segmentation loop) bit-matches. One mapInPandas pass; container
    bytes never cross a shuffle."""
    src = videos.select("video_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                frames = decode_video(bytes(data)).astype(np.int64)
                n, h, w, _ = frames.shape
                denom = h * w * 3 * 255
                bounds = [0]
                for i in range(1, n):
                    mad = int(np.abs(frames[i] - frames[i - 1]).sum())
                    if (1000 * mad) // denom >= threshold_permille:
                        bounds.append(i)
                bounds.append(n)
                for s in range(len(bounds) - 1):
                    a, b = bounds[s], bounds[s + 1]
                    best_i, best_e = a, -1
                    for i in range(a, b):
                        c = frames[i].sum(axis=2)
                        lap = (
                            4 * c[1:-1, 1:-1]
                            - c[:-2, 1:-1]
                            - c[2:, 1:-1]
                            - c[1:-1, :-2]
                            - c[1:-1, 2:]
                        )
                        e = int((lap * lap).sum())
                        if e > best_e:
                            best_i, best_e = i, e
                    rows.append((vid, s, a, b - 1, best_i, best_e))
            yield pd.DataFrame(rows, columns=[f.name for f in KEYFRAME_SCHEMA.fields])

    return src.mapInPandas(run, KEYFRAME_SCHEMA)


# -- audio: opaque binary container + feature extraction -----------------------------
# Container (stand-in for wav/flac): b"RCA1\n<rate> <n>\n" + n int16 LE
# samples. Real decoders bind in decode_external; numpy carries the
# feature math (RMS, zero-crossing rate, dominant frequency via rFFT).

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_cross_rate", T.DoubleType(), False),
        T.StructField("dominant_hz", T.DoubleType(), False),
    ]
)


def encode_audio(samples: np.ndarray, rate: int) -> bytes:
    assert samples.dtype == np.int16
    return b"RCA1\n%d %d\n" % (rate, len(samples)) + samples.tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data[:5] != b"RCA1\n":
        raise ValueError(f"unknown audio magic {data[:5]!r}")
    nl = data.index(b"\n", 5)
    rate, n = (int(t) for t in data[5:nl].split())
    return np.frombuffer(data, dtype=np.int16, offset=nl + 1, count=n), rate


def synthesize_audio(ids: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """Deterministic audio clips: a sine at an id-derived frequency plus
    id-seeded noise — gives every feature a known-ish ground truth."""
    from ..xxh import xxh64

    out_schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("rate", T.IntegerType(), False),
        ]
    )
    src = ids.select(F.col(id_col).cast("string").alias("audio_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid in pdf["audio_id"]:
                h64 = xxh64(aid.encode())
                rate = 8000
                n = rate // 2  # 0.5 s
                freq = 100.0 + (h64 % 1900)  # 100..1999 Hz
                t = np.arange(n) / rate
                rng = np.random.default_rng(h64 & 0xFFFFFFFF)
                wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
                samples = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
                rows.append((aid, encode_audio(samples, rate), rate))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "rate"])

    return src.mapInPandas(run, out_schema)


def audio_features(clips: DataFrame) -> DataFrame:
    """(audio_id, bytes) → decoded metadata + RMS + ZCR + dominant
    frequency (rFFT argmax) — the audio feature-extract stage, one numpy
    pass per Arrow batch."""
    src = clips.select("audio_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                s, rate = decode_audio(bytes(data))
                x = s.astype(np.float64) / 32767.0
                n = len(x)
                # exact int64 sum-of-squares -> fixed IEEE op sequence, so
                # the expected-values twin reproduces the double bit-for-bit
                s64 = s.astype(np.int64)
                ss = int(np.dot(s64, s64))
                rms = float(np.sqrt(ss / n) / 32767.0)
                zcr = float(np.mean((s[1:] < 0) != (s[:-1] < 0)))
                spec = np.abs(np.fft.rfft(x))
                spec[0] = 0.0  # ignore DC
                dom = float(np.argmax(spec) * rate / n)
                rows.append(
                    (aid, rate, n, round(n / rate, 6), round(rms, 6),
                     round(zcr, 6), round(dom, 3))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return src.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# -- real RIFF/WAVE audio (batch 56) ------------------------------------------
# Same deterministic clip law as synthesize_audio (0.5 s @ 8 kHz sine at an
# id-derived frequency + id-seeded noise), but carried in the REAL
# interchange container (rcspark.wav — stdlib-`wave`-interoperable RIFF)
# with an INFO/INAM title chunk the decoder's chunk walker must parse past.

WAV_FEATURES_SCHEMA = T.StructType(
    list(AUDIO_FEATURES_SCHEMA.fields)
    + [T.StructField("title", T.StringType(), False)]
)


def synthesize_wav(ids: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """Deterministic clips as real RIFF/WAVE bytes (title = 'clip:<id>')."""
    from ..wav import encode_wav
    from ..xxh import xxh64

    out_schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
        ]
    )
    src = ids.select(F.col(id_col).cast("string").alias("audio_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid in pdf["audio_id"]:
                h64 = xxh64(aid.encode())
                rate = 8000
                n = rate // 2
                freq = 100.0 + (h64 % 1900)
                t = np.arange(n) / rate
                rng = np.random.default_rng(h64 & 0xFFFFFFFF)
                wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
                samples = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
                rows.append((aid, encode_wav(samples, rate, title=f"clip:{aid}")))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes"])

    return src.mapInPandas(run, out_schema)


def wav_features(clips: DataFrame) -> DataFrame:
    """(audio_id, bytes=RIFF/WAVE) → metadata + RMS/ZCR/dominant-frequency
    (the audio_features math over the real container) + the INAM title."""
    from ..wav import decode_wav

    src = clips.select("audio_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                s, rate, title = decode_wav(bytes(data))
                n = len(s)
                s64 = s.astype(np.int64)
                ss = int(np.dot(s64, s64))
                rms = float(np.sqrt(ss / n) / 32767.0)
                zcr = float(np.mean((s[1:] < 0) != (s[:-1] < 0)))
                x = s.astype(np.float64) / 32767.0
                spec = np.abs(np.fft.rfft(x))
                spec[0] = 0.0
                dom = float(np.argmax(spec) * rate / n)
                rows.append(
                    (aid, rate, n, round(n / rate, 6), round(rms, 6),
                     round(zcr, 6), round(dom, 3), title or "")
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_FEATURES_SCHEMA.fields]
            )

    return src.mapInPandas(run, WAV_FEATURES_SCHEMA)


# -- exact-integer bicubic resize (batch 62) -----------------------------------
# [U Catmull-Rom spline resampling (Keys 1981, a=−0.5) — what PIL
# Image.BICUBIC / OpenCV INTER_CUBIC implement in float]: here in EXACT
# fixed-point so both the engine and the scalar twin produce bit-identical
# pixels.  With source fraction f ∈ [0,256) the four tap weights scaled by
# 2²⁵ are integer polynomials in f:
#     w₋₁ = −f³ +  512f² − 65536f
#     w₀  =  3f³ − 1280f² + 33554432
#     w₁  = −3f³ + 1024f² + 65536f
#     w₂  =   f³ −  256f²
# whose SUM is exactly 2²⁵ for every f (the f³/f²/f coefficients cancel) —
# no normalization, no drift.  Separable: the horizontal pass keeps raw
# Σw·p accumulators (≤2²⁵·255·2 per tap group), the vertical pass stacks a
# second 2²⁵ factor (≤~2⁵⁹, safely int64), and ONE half-up rounding shift
# (+2⁴⁹ ≫ 50) lands the final pixel.  Half-pixel centers, edge clamp.
# Thumbs upgrade path: IMAGES_THUMBS uses integer block-mean (exact for
# integer ratios); this is the quality kernel for arbitrary ratios.

_BICUBIC_SHIFT = 25


def _cubic_weights_256(frac: np.ndarray) -> np.ndarray:
    """(n,) frac in [0,256) → (n, 4) int64 weights scaled by 2^25."""
    f = frac.astype(np.int64)
    f2 = f * f
    f3 = f2 * f
    return np.stack(
        [
            -f3 + 512 * f2 - 65536 * f,
            3 * f3 - 1280 * f2 + 33554432,
            -3 * f3 + 1024 * f2 + 65536 * f,
            f3 - 256 * f2,
        ],
        axis=1,
    )


def _axis_taps(n_in: int, n_out: int) -> tuple[np.ndarray, np.ndarray]:
    """Half-pixel source mapping → ((n_out, 4) clamped indices,
    (n_out, 4) int64 weights)."""
    xo = np.arange(n_out, dtype=np.int64)
    x256 = ((2 * xo + 1) * n_in * 128) // n_out - 128
    base = x256 >> 8
    frac = x256 & 255
    idx = base[:, None] + np.arange(-1, 3, dtype=np.int64)[None, :]
    np.clip(idx, 0, n_in - 1, out=idx)
    return idx, _cubic_weights_256(frac)


def bicubic_resize(pix: np.ndarray, w_out: int, h_out: int) -> np.ndarray:
    """uint8 (h, w, 3) → uint8 (h_out, w_out, 3), exact-integer separable
    Catmull-Rom (module-section spec)."""
    h, w = pix.shape[:2]
    xi, xw = _axis_taps(w, w_out)
    yi, yw = _axis_taps(h, h_out)
    p = pix.astype(np.int64)
    # horizontal: (h, w_out, 3) raw accumulators (scale 2^25)
    gathered = p[:, xi, :]                       # (h, w_out, 4, 3)
    hacc = (gathered * xw[None, :, :, None]).sum(axis=2)   # (h, w_out, 3)
    gathered_v = hacc[yi, :, :]                  # (h_out, 4, w_out, 3)
    acc = (gathered_v * yw[:, :, None, None]).sum(axis=1)  # (h_out, w_out, 3)
    out = (acc + (1 << 49)) >> 50
    return np.clip(out, 0, 255).astype(np.uint8)


BICUBIC_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w_in", T.IntegerType(), False),
        T.StructField("h_in", T.IntegerType(), False),
        T.StructField("w_out", T.IntegerType(), False),
        T.StructField("h_out", T.IntegerType(), False),
        T.StructField("px_digest", T.LongType(), False),
        T.StructField("c_r", T.IntegerType(), False),
        T.StructField("c_g", T.IntegerType(), False),
        T.StructField("c_b", T.IntegerType(), False),
    ]
)


def bicubic_half_features(ids: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Resize the smooth fixture to half dims with the exact-integer
    bicubic kernel; emit dims + pixel digest + center pixel."""
    from ..fixtures import make_smooth_image
    from .hashing import digest60_py

    src = ids.select(F.col(id_col).cast("string").alias("image_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                h, w = pix.shape[:2]
                wo, ho = w // 2, h // 2
                out = bicubic_resize(pix, wo, ho)
                c = out[ho // 2, wo // 2]
                rows.append(
                    (iid, w, h, wo, ho,
                     digest60_py(out.tobytes().hex()),
                     int(c[0]), int(c[1]), int(c[2]))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in BICUBIC_SCHEMA.fields]
            )

    return src.mapInPandas(run, BICUBIC_SCHEMA)


# -- text-overlay / meme detection (batch 59) ----------------------------------
# [U LAION-style text-heavy-image filtering practice]: rendered glyph rows
# produce dense short-run horizontal luma transitions; photographic
# content does not.  Decode-free over the shared generator
# (fixtures.make_text_overlay_image): integer luma (77r+150g+29b)>>8, a
# row is text-like when its count of adjacent-pixel jumps >40 reaches
# w/8, and the image is gated on the text-row ratio.  The raw per-image
# counts are re-derived by the independent twin
# (scripts/gen_media_expected.py expected_img_textdensity, per-row loop +
# reduceat instead of the vectorized diff); the ppm + gate arithmetic is
# restated by the oracle in SQL.

TEXT_DENSITY_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("n_text_rows", T.IntegerType(), False),
        T.StructField("text_ppm", T.LongType(), False),
        T.StructField("is_text_heavy", T.BooleanType(), False),
    ]
)

TEXT_JUMP_THRESH = 40   # luma delta that counts as a glyph-edge transition
TEXT_ROW_FRAC = 8       # row is text-like when transitions ≥ w / this
TEXT_HEAVY_PPM = 250_000  # gate: ≥ 25% text-like rows


def text_overlay_density(ids: DataFrame, id_col: str = "item_id") -> DataFrame:
    """(item_id) → per-image text-band statistics + the meme gate."""
    from ..fixtures import make_text_overlay_image

    src = ids.select(F.col(id_col).cast("string").alias("item_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid in pdf["item_id"]:
                pix = make_text_overlay_image(iid).astype(np.int64)
                h, w = pix.shape[:2]
                luma = (77 * pix[:, :, 0] + 150 * pix[:, :, 1] + 29 * pix[:, :, 2]) >> 8
                jumps = np.abs(np.diff(luma, axis=1)) > TEXT_JUMP_THRESH
                text_rows = int((jumps.sum(axis=1) >= w // TEXT_ROW_FRAC).sum())
                ppm = 1_000_000 * text_rows // h
                rows.append(
                    (iid, h, w, text_rows, ppm, ppm >= TEXT_HEAVY_PPM)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TEXT_DENSITY_SCHEMA.fields]
            )

    return src.mapInPandas(run, TEXT_DENSITY_SCHEMA)


# -- audio band energies (batch 72) --------------------------------------------
# Spec in queries.py batch-72 section: |X_k|² rounds to integer per bin
# (ONE deterministic round), band sums are exact int64 over 8 linear
# bands of the rFFT (DC excluded), shares in ppm.

BAND_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("share_ppm", T.LongType(), False),
    ]
)

N_AUDIO_BANDS = 8


def band_energies(clips: DataFrame) -> DataFrame:
    """(audio_id, bytes=RIFF/WAVE) → 8 rows per clip with integer band
    energy + ppm share."""
    from ..wav import decode_wav

    src = clips.select("audio_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                s, rate, _ = decode_wav(bytes(data))
                x = s.astype(np.float64) / 32767.0
                spec = np.fft.rfft(x)
                e = np.round(spec.real**2 + spec.imag**2).astype(np.int64)
                e[0] = 0  # exclude DC
                nbins = len(e) - 1  # bins 1..len-1 split into 8 bands
                bounds = [1 + nbins * b // N_AUDIO_BANDS for b in range(N_AUDIO_BANDS + 1)]
                bands = [int(e[bounds[b] : bounds[b + 1]].sum()) for b in range(N_AUDIO_BANDS)]
                total = max(sum(bands), 1)
                for b, en in enumerate(bands):
                    rows.append((aid, b, en, 1_000_000 * en // total))
            yield pd.DataFrame(
                rows, columns=[f.name for f in BAND_ENERGY_SCHEMA.fields]
            )

    return src.mapInPandas(run, BAND_ENERGY_SCHEMA)


PHASH_MAX_BUCKET = 10_000  # shared with the DuckDB oracle's guard CTE


def convert_images(
    images: DataFrame, to_fmt: str = "png", bytes_col: str = "bytes", fmt_col: str = "fmt"
) -> DataFrame:
    """A16 convert-on-store: re-encode every image to a single storage
    format before the corpus write — the Scrapy ImagesPipeline semantic
    (it converts everything to JPEG; we convert to PNG, the sandbox's real
    interoperable codec, which is lossless so decoded pixels are
    bit-identical). Arrow-batched mapInPandas; schema unchanged (bytes
    replaced, fmt restamped)."""
    import pandas as pd

    if to_fmt != "png":
        raise ValueError(f"convert_images supports to_fmt='png', got {to_fmt!r}")

    from ..codecs import decode_image
    from ..png import encode_png

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [encode_png(decode_image(bytes(b))[0]) for b in pdf[bytes_col]]
            yield pdf.assign(**{bytes_col: out, fmt_col: to_fmt})

    return images.mapInPandas(run, images.schema)


def phash_neardup_pairs(
    items: DataFrame,
    max_hamming: int = 6,
    id_col: str = "item_id",
    phash_col: str = "phash",
    nbands: int = 8,
    max_bucket: int = PHASH_MAX_BUCKET,
    persisted_out: list | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming): near-duplicate media pairs by perceptual-hash
    Hamming distance, banded-LSH blocked (SURVEY A17 — the dupe-media
    filter beyond exact URL/byte dedup).

    The 64-bit phash splits into ``nbands`` byte bands; by pigeonhole, two
    hashes within ``max_hamming < nbands`` bits MUST agree on at least one
    band, so the band-equality self-join has exact recall for
    max_hamming ≤ nbands-1 while scanning only per-bucket candidates.
    ``max_bucket`` is the standard skew guard (a degenerate band value —
    e.g. all-dark thumbnails hashing to 0x00 — is dropped before the
    O(b²) pair blow-up). Exact verify = one codegen bit_count(xor).
    """
    src = items.select(F.col(id_col).alias("item_id"), F.col(phash_col).alias("ph"))
    bands = src.select(
        "item_id",
        "ph",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("ph"), 8 * b).bitwiseAND(F.lit(255))
                    for b in range(nbands)
                ]
            )
        ).alias("band", "byte"),
    ).persist()
    if persisted_out is not None:
        persisted_out.append(bands)
    sizes = bands.groupBy("band", "byte").agg(F.count("*").alias("_b"))
    bounded = bands.join(
        sizes.filter(F.col("_b") <= max_bucket), ["band", "byte"]
    ).drop("_b")
    a = bounded.select(
        "band", "byte", F.col("item_id").alias("id_a"), F.col("ph").alias("_pa")
    )
    c = bounded.select(
        "band", "byte", F.col("item_id").alias("id_b"), F.col("ph").alias("_pb")
    )
    ham = F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb")))
    return (
        a.join(c, ["band", "byte"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_pa", "_pb")
        .distinct()
        .filter(ham <= max_hamming)
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
    )


def synthesize_images(ids: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Deterministic corpus-shaped image table from an id column.

    Sandbox generator for benchmarks/tests at arbitrary scale: the image for
    an id is a pure function of the id (same construction as
    rcspark.fixtures.make_image), so any two runs — and the Python oracle —
    agree byte-for-byte.
    """
    from ..fixtures import make_image

    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )
    src = ids.select(F.col(id_col).cast("string").alias("image_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid in pdf["image_id"]:
                data, w, h, fmt, ph = make_image(iid)
                rows.append((iid, data, w, h, fmt, ph))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return src.mapInPandas(run, out_schema)


# -- ViT-style patch extraction ------------------------------------------------

PATCHIFY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("grid_w", T.IntegerType(), False),
        T.StructField("grid_h", T.IntegerType(), False),
        T.StructField("n_patches", T.IntegerType(), False),
        T.StructField("crop_top", T.IntegerType(), False),
        T.StructField("crop_left", T.IntegerType(), False),
        T.StructField("total_luma", T.LongType(), False),
        T.StructField("patch_digest", T.LongType(), False),
    ]
)


def patchify_images(images: DataFrame, patch: int = 12) -> DataFrame:
    """(image_id, bytes) → ViT-preproc patch grid: center-crop to a
    multiple of `patch`, split into patch×patch cells, per-patch
    exact-integer luma sums (r+g+b over the cell), digested in row-major
    order — the patch-token sequence a vision encoder would embed,
    compressed to one hash-checkable row per image.  All integer
    arithmetic (no float reductions), one numpy pass per Arrow batch."""
    from ..xxh import xxh64

    src = images.select("image_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                h, w, _ = pix.shape
                gh, gw = h // patch, w // patch
                top, left = (h - gh * patch) // 2, (w - gw * patch) // 2
                crop = pix[top : top + gh * patch, left : left + gw * patch]
                luma = crop.astype(np.int64).sum(axis=2)
                ps = luma.reshape(gh, patch, gw, patch).sum(axis=(1, 3))
                seq = ",".join(str(int(v)) for v in ps.flatten())
                dig = xxh64(seq.encode())
                dig = dig - (1 << 64) if dig >= (1 << 63) else dig
                out.append(
                    (iid, gw, gh, gh * gw, top, left, int(luma.sum()), dig)
                )
            yield pd.DataFrame(out, columns=[f.name for f in PATCHIFY_SCHEMA.fields])

    return src.mapInPandas(run, PATCHIFY_SCHEMA)


# -- energy-threshold voice-activity detection ----------------------------------

VAD_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("seg_idx", T.IntegerType(), False),
        T.StructField("start_frame", T.IntegerType(), False),
        T.StructField("end_frame", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("meansq_mean", T.LongType(), False),
    ]
)


def synthesize_speech(ids: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """Deterministic silence/voice clips (rcspark.fixtures.make_speech_samples)
    encoded as RCA1 — the VAD test corpus with planted voiced spans."""
    from ..fixtures import make_speech_samples

    out_schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
        ]
    )
    src = ids.select(F.col(id_col).cast("string").alias("audio_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (aid, encode_audio(make_speech_samples(aid), 8000))
                for aid in pdf["audio_id"]
            ]
            yield pd.DataFrame(rows, columns=["audio_id", "bytes"])

    return src.mapInPandas(run, out_schema)


def vad_segments(
    clips: DataFrame, frame_len: int = 160, thresh_meansq: int = 1_000_000
) -> DataFrame:
    """(audio_id, bytes) → voiced segments via frame-energy VAD: per-frame
    exact-integer mean-square (sum(s²) // frame_len) thresholded, then
    consecutive voiced frames merged into [start_frame, end_frame]
    segments (vectorized gaps-and-islands over the flag diff).  seg_idx is
    1-based per clip; meansq_mean is the exact integer mean of the
    segment's frame energies.  The audio twin of scene-cut detection —
    what a speech-data pipeline runs to clip silence before ASR."""
    src = clips.select("audio_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                s, _rate = decode_audio(bytes(data))
                nf = len(s) // frame_len
                fr = s[: nf * frame_len].astype(np.int64).reshape(nf, frame_len)
                ms = (fr * fr).sum(axis=1) // frame_len
                voiced = ms >= thresh_meansq
                edges = np.diff(voiced.astype(np.int8))
                starts = np.flatnonzero(edges == 1) + 1
                ends = np.flatnonzero(edges == -1)
                if voiced[0]:
                    starts = np.insert(starts, 0, 0)
                if voiced[-1]:
                    ends = np.append(ends, nf - 1)
                for i, (a, b) in enumerate(zip(starts, ends), start=1):
                    seg = ms[a : b + 1]
                    out.append(
                        (
                            aid,
                            i,
                            int(a),
                            int(b),
                            int(b - a + 1),
                            int(seg.sum()) // len(seg),
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in VAD_SCHEMA.fields])

    return src.mapInPandas(run, VAD_SCHEMA)


# -- Laplacian sharpness / blur-quality gate -------------------------------------

SHARPNESS_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("lap_energy", T.LongType(), False),
        T.StructField("n_interior", T.LongType(), False),
        T.StructField("lap_meansq", T.LongType(), False),
    ]
)


def box_blur_images(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """(id, bytes) → 2×2 box-blurred PPM re-encode (floor-mean blocks,
    pixel-doubling upsample back to the source dims).  The deterministic
    degraded twin for sharpness-gate tests: integer block means only, no
    float filtering, so the expected-values twin reproduces it exactly."""
    src = images.select(F.col(id_col).alias("image_id"), "bytes")
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                h, w, _ = pix.shape
                blocks = (
                    pix.reshape(h // 2, 2, w // 2, 2, 3)
                    .astype(np.int64)
                    .sum(axis=(1, 3))
                    // 4
                ).astype(np.uint8)
                up = np.repeat(np.repeat(blocks, 2, axis=0), 2, axis=1)
                out.append((iid, encode_ppm(up)))
            yield pd.DataFrame(out, columns=["image_id", "bytes"])

    return src.mapInPandas(run, schema)


def sharpness_features(images: DataFrame, id_col: str = "item_id") -> DataFrame:
    """(id, bytes) → exact-integer Laplacian sharpness: luma = r+g+b
    (int64, no division), 4-neighbor Laplacian over interior pixels,
    lap_energy = Σ lap², lap_meansq = energy // n_interior.  The standard
    variance-of-Laplacian blur gate, kept in exact integers so the
    independent numpy twin (scripts/gen_media_expected.py) bit-matches.
    One vectorized numpy pass per Arrow batch; blob column dropped at the
    UDF boundary."""
    src = images.select(F.col(id_col).alias("item_id"), "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["item_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                h, w, _ = pix.shape
                c = pix.astype(np.int64).sum(axis=2)
                lap = (
                    4 * c[1:-1, 1:-1]
                    - c[:-2, 1:-1]
                    - c[2:, 1:-1]
                    - c[1:-1, :-2]
                    - c[1:-1, 2:]
                )
                energy = int((lap * lap).sum())
                n = lap.size
                out.append((iid, w, h, energy, n, energy // n))
            yield pd.DataFrame(out, columns=[f.name for f in SHARPNESS_SCHEMA.fields])

    return src.mapInPandas(run, SHARPNESS_SCHEMA)


# -- loudness / hard-clipping gate -------------------------------------------------

CLIPPING_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType(), False),
        T.StructField("rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("n_clipped", T.LongType(), False),
        T.StructField("clip_ppm", T.LongType(), False),
        T.StructField("peak_abs", T.LongType(), False),
    ]
)


def hard_gain_clips(clips: DataFrame, gain: int = 4, id_col: str = "audio_id") -> DataFrame:
    """(id, bytes) → the same clip re-encoded after an exact integer gain
    (s·gain clipped to ±32767) — the deterministic hard-clipped twin for
    clipping-gate tests (a 4× gain drives a 0.6-amplitude sine into
    clipping ~73% of its samples; the originals clip essentially none)."""
    src = clips.select(F.col(id_col).alias("audio_id"), "bytes")
    schema = T.StructType(
        [
            T.StructField("audio_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                s, rate = decode_audio(bytes(data))
                g = np.clip(s.astype(np.int32) * gain, -32767, 32767).astype(np.int16)
                rows.append((aid, encode_audio(g, rate)))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes"])

    return src.mapInPandas(run, schema)


def clipping_features(clips: DataFrame, id_col: str = "item_id") -> DataFrame:
    """(id, bytes) → exact-integer clipping statistics: clipped-sample
    count (|s| ≥ 32767), clip rate in ppm (integer division), absolute
    peak — the loudness-damage gate an audio-curation pipeline runs before
    training. All int64; one vectorized pass per Arrow batch."""
    src = clips.select(F.col(id_col).alias("item_id"), "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["item_id"], pdf["bytes"]):
                s, rate = decode_audio(bytes(data))
                a = np.abs(s.astype(np.int64))
                n = len(s)
                n_clipped = int((a >= 32767).sum())
                rows.append(
                    (iid, rate, n, n_clipped, (1_000_000 * n_clipped) // n,
                     int(a.max()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in CLIPPING_SCHEMA.fields])

    return src.mapInPandas(run, CLIPPING_SCHEMA)


# -- letterbox / pillarbox bar detection --------------------------------------------

CONTENT_BOX_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("crop_top", T.IntegerType(), False),
        T.StructField("crop_left", T.IntegerType(), False),
        T.StructField("crop_w", T.IntegerType(), False),
        T.StructField("crop_h", T.IntegerType(), False),
        T.StructField("bar_permille", T.LongType(), False),
    ]
)


def letterbox_images(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """(id, bytes) → the image embedded in black bars (letterbox or
    pillarbox, id-derived orientation and thickness 4..12) — the planted
    degraded twin for border-crop tests.  Spec (shared with the expected-
    values twin, like make_image): h64 = xxh64(id); vertical bars iff
    h64 % 2 == 0; thickness t = 4 + (h64 >> 4) % 9."""
    from ..xxh import xxh64

    src = images.select(F.col(id_col).alias("image_id"), "bytes")
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                h, w, _ = pix.shape
                h64 = xxh64(iid.encode())
                t = 4 + (h64 >> 4) % 9
                if h64 % 2 == 0:
                    canvas = np.zeros((h + 2 * t, w, 3), dtype=np.uint8)
                    canvas[t : t + h] = pix
                else:
                    canvas = np.zeros((h, w + 2 * t, 3), dtype=np.uint8)
                    canvas[:, t : t + w] = pix
                rows.append((iid, encode_ppm(canvas)))
            yield pd.DataFrame(rows, columns=["image_id", "bytes"])

    return src.mapInPandas(run, schema)


def content_box(images: DataFrame, id_col: str = "item_id") -> DataFrame:
    """(id, bytes) → detected content bounding box: a bar row/column is one
    whose every byte is 0 (pure black); crop = [first..last] non-bar row ×
    non-bar column, bar_permille = fraction of pixels outside the crop.
    The LAION-style border-removal pass before training.  Vectorized
    any-nonzero reductions per Arrow batch; exact integers throughout.
    (Uniform-noise testdata can't fake a bar: an all-zero 16-px row has
    probability 256^-48.)"""
    src = images.select(F.col(id_col).alias("item_id"), "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["item_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                h, w, _ = pix.shape
                nz_rows = np.flatnonzero(pix.any(axis=(1, 2)))
                nz_cols = np.flatnonzero(pix.any(axis=(0, 2)))
                if len(nz_rows) == 0:
                    top, left, cw, ch = 0, 0, 0, 0
                else:
                    top, bot = int(nz_rows[0]), int(nz_rows[-1])
                    left, right = int(nz_cols[0]), int(nz_cols[-1])
                    ch, cw = bot - top + 1, right - left + 1
                bar = (1000 * (h * w - ch * cw)) // (h * w)
                rows.append((iid, w, h, top, left, cw, ch, bar))
            yield pd.DataFrame(
                rows, columns=[f.name for f in CONTENT_BOX_SCHEMA.fields]
            )

    return src.mapInPandas(run, CONTENT_BOX_SCHEMA)


# -- integer half-rate resampling ----------------------------------------------------

RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("rate_out", T.IntegerType(), False),
        T.StructField("n_out", T.IntegerType(), False),
        T.StructField("sum_abs", T.LongType(), False),
        T.StructField("sum_sq", T.LongType(), False),
    ]
)


def resample_half(clips: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """(id, bytes) → 2:1 decimation with a 2-tap box anti-alias filter
    (out[i] = floor((s[2i] + s[2i+1]) / 2), exact integers) summarized as
    hash-checkable reductions (count, Σ|x|, Σx²) — the sample-rate
    normalization pass an audio-training pipeline runs before feature
    extraction. Floor division matches Python's // on negatives, so the
    per-sample twin reproduces every value exactly."""
    src = clips.select(F.col(id_col).alias("audio_id"), "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                s, rate = decode_audio(bytes(data))
                s64 = s.astype(np.int64)
                out = (s64[0::2] + s64[1::2]) // 2
                rows.append(
                    (aid, rate // 2, len(out), int(np.abs(out).sum()),
                     int((out * out).sum()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESAMPLE_SCHEMA.fields])

    return src.mapInPandas(run, RESAMPLE_SCHEMA)


# -- dominant-color extraction --------------------------------------------------------

DOMCOLOR_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("dom_bin", T.IntegerType(), False),
        T.StructField("dom_count", T.LongType(), False),
        T.StructField("n_pixels", T.LongType(), False),
        T.StructField("share_ppm", T.LongType(), False),
    ]
)


def dominant_color(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """(id, bytes) → dominant 64-bin color (2 bits per channel, bin =
    (r>>6)<<4 | (g>>6)<<2 | (b>>6)), most-populated bin with lowest-bin
    tie-break, share in exact ppm — the palette/near-dup blocking signal a
    media-curation pipeline extracts per image. One vectorized bincount
    per image."""
    src = images.select(F.col(id_col).alias("image_id"), "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                q = (pix >> 6).astype(np.int64)
                bins = (q[:, :, 0] << 4) | (q[:, :, 1] << 2) | q[:, :, 2]
                counts = np.bincount(bins.ravel(), minlength=64)
                dom = int(counts.argmax())  # argmax returns the FIRST max
                n = int(bins.size)
                rows.append(
                    (iid, dom, int(counts[dom]), n,
                     (1_000_000 * int(counts[dom])) // n)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DOMCOLOR_SCHEMA.fields])

    return src.mapInPandas(run, DOMCOLOR_SCHEMA)


# -- exact-integer luma histogram equalization ------------------------------------------

EQUALIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("n_pixels", T.LongType(), False),
        T.StructField("lo_in", T.IntegerType(), False),
        T.StructField("hi_in", T.IntegerType(), False),
        T.StructField("hi_out", T.IntegerType(), False),
        T.StructField("eq_sum", T.LongType(), False),
    ]
)


def equalize_luma(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """(id, bytes) → exact-integer histogram equalization of the luma
    channel (g = r+g+b ∈ 0..765): h(v) = ((cdf(v) − cdf_min) · 765) //
    (N − cdf_min), the classic contrast-stretch in pure integer floor
    arithmetic, summarized as (N, input min/max, output max, Σ equalized)
    so the independent twin can hash-match. One bincount + cumsum + take
    per image."""
    src = images.select(F.col(id_col).alias("image_id"), "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                g = pix.astype(np.int64).sum(axis=2).ravel()
                hist = np.bincount(g, minlength=766)
                cdf = hist.cumsum()
                nz = np.flatnonzero(hist)
                cdf_min = int(cdf[nz[0]])
                n = int(g.size)
                denom = n - cdf_min
                if denom == 0:
                    eq = np.zeros_like(g)
                else:
                    lut = ((cdf - cdf_min) * 765) // denom
                    eq = lut[g]
                rows.append(
                    (iid, n, int(nz[0]), int(nz[-1]), int(eq.max()),
                     int(eq.sum()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in EQUALIZE_SCHEMA.fields])

    return src.mapInPandas(run, EQUALIZE_SCHEMA)


# --------------------------------------------------------------------------
# BMP (batch 22): the uncompressed-interchange arrival format
# --------------------------------------------------------------------------

BMP_RT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_bmp_bytes", T.LongType(), False),
        T.StructField("exact", T.BooleanType(), False),
    ]
)


def _bmp_fixture_pixels(image_id: str) -> np.ndarray:
    """Shared data generator (like make_smooth_image itself): the smooth
    fixture cropped by xxh64(id)%4 columns, so row strides hit every
    4-byte padding residue (widths 16/32/64 are all ≡0 mod 4; crops 0-3
    reach residues 0/3/2/1) — the BMP-specific failure surface the stock
    16/32/64 widths (all ≡0 mod 4) would never exercise."""
    from ..fixtures import make_smooth_image
    from ..xxh import xxh64

    pix = make_smooth_image(image_id)
    crop = (xxh64(image_id.encode()) >> 24) % 4
    return pix[:, : pix.shape[1] - crop] if crop else pix


def bmp_roundtrip(ids: DataFrame) -> DataFrame:
    """A16 uncompressed-arrival audit: encode the padded-width fixture to
    REAL 24-bit BMP (rcspark.bmp), decode it back, report size + exact
    flag. BMP is lossless so `exact` must be True for every row — but the
    column is COMPUTED (decode-and-compare): the expected parquet twin
    re-decodes the same bytes with the independent scalar
    scripts/bmp_twin.py walk, so a defect in the encoder or either
    decoder (notably a stride/padding slip) breaks the driver's hash."""
    from ..bmp import decode_bmp, encode_bmp

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = _bmp_fixture_pixels(iid)
                data = encode_bmp(pix)
                dec = decode_bmp(data)
                out.append(
                    (iid, pix.shape[1], pix.shape[0], len(data),
                     bool(np.array_equal(dec, pix)))
                )
            yield pd.DataFrame(out, columns=[f.name for f in BMP_RT_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, BMP_RT_SCHEMA)


BMP_TRANSCODE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_bmp_bytes", T.LongType(), False),
        T.StructField("n_jpeg_bytes", T.LongType(), False),
        T.StructField("bmp_exact", T.BooleanType(), False),
        T.StructField("sse", T.LongType(), False),
        T.StructField("psnr40_ok", T.BooleanType(), False),
    ]
)


def bmp_to_jpeg_transcode(ids: DataFrame, quality: int = 90) -> DataFrame:
    """A16 ingest-to-store transcode, BMP leg ([U scrapy/pipelines/images.py]
    `convert_image` re-encodes whatever arrives to JPEG): decode the REAL
    BMP arrival, re-encode to REAL baseline JPEG, judge fidelity against
    the original pixels under the north rule's exact-integer PSNR≥40
    predicate (sse·10⁴ ≤ npx·255²). Twin re-runs both decode legs with the
    independent scalar decoders (scripts/bmp_twin.py, scripts/jpeg_twin.py)."""
    from ..bmp import decode_bmp, encode_bmp
    from ..jpeg import decode_jpeg, encode_jpeg

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = _bmp_fixture_pixels(iid)
                bdata = encode_bmp(pix)
                dec_b = decode_bmp(bdata)
                bmp_exact = bool(np.array_equal(dec_b, pix))
                jdata = encode_jpeg(dec_b, quality=quality)
                dec_j = decode_jpeg(jdata)
                diff = dec_j.astype(np.int64) - pix.astype(np.int64)
                sse = int((diff * diff).sum())
                npx = pix.shape[0] * pix.shape[1] * 3
                out.append(
                    (iid, pix.shape[1], pix.shape[0], len(bdata), len(jdata),
                     bmp_exact, sse, bool(sse * 10_000 <= npx * 65_025))
                )
            yield pd.DataFrame(out, columns=[f.name for f in BMP_TRANSCODE_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, BMP_TRANSCODE_SCHEMA)


# --------------------------------------------------------------------------
# Tile (quadrant) perceptual hashing (batch 22): the watermark/crop-resistant
# near-dup tier — a quarter-region logo overlay flips enough global-phash
# bits to escape img_phash_neardup's radius, but three of four quadrant
# hashes stay identical. [U scrapy/pipelines/images.py dupe filter is
# checksum-exact; this is the perceptual tier curation pipelines add.]
# --------------------------------------------------------------------------

TILE_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("qham0", T.LongType(), False),
        T.StructField("qham1", T.LongType(), False),
        T.StructField("qham2", T.LongType(), False),
        T.StructField("qham3", T.LongType(), False),
        T.StructField("n_quad_match", T.LongType(), False),
        T.StructField("global_hamming", T.LongType(), False),
        T.StructField("tile_dup", T.BooleanType(), False),
        T.StructField("global_dup", T.BooleanType(), False),
    ]
)

TILE_MAX_HAMMING = 6     # per-quadrant (and global) phash radius
TILE_MIN_QUADS = 3       # quadrants that must match for a tile-level dup


def quadrant_phashes(pix: np.ndarray) -> list[int]:
    """[q0, q1, q2, q3] row-major quadrant phash64 values (h, w even in
    the fixture tier; odd dims would put the extra row/col in the
    second half via the h//2 split)."""
    from ..codecs import phash64

    h, w = pix.shape[:2]
    hh, hw = h // 2, w // 2
    return [
        phash64(pix[:hh, :hw]),
        phash64(pix[:hh, hw:]),
        phash64(pix[hh:, :hw]),
        phash64(pix[hh:, hw:]),
    ]


def tile_phash_audit(ids: DataFrame) -> DataFrame:
    """Per image: hamming between the original and its watermarked variant
    (shared generator rcspark.fixtures.make_watermarked) at the global and
    per-quadrant level, plus the two dedup verdicts. COMPUTED columns only;
    the expected parquet twin re-derives the quadrant split + phash with
    the independent scalar implementation (scripts/gen_media_expected.py
    twin_phash), so a slip in either hash or the split breaks the driver
    hash. At corpus scale the quadrant hashes feed the same banded-bucket
    join as img_phash_neardup (4× rows, identical shape) — this query pins
    the hash tier itself."""
    from ..codecs import phash64
    from ..fixtures import make_smooth_image, make_watermarked

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                base = make_smooth_image(iid)
                var = make_watermarked(iid)
                qa, qb = quadrant_phashes(base), quadrant_phashes(var)
                qham = [bin((a ^ b) & ((1 << 64) - 1)).count("1")
                        for a, b in zip(qa, qb)]
                gham = bin((phash64(base) ^ phash64(var)) & ((1 << 64) - 1)).count("1")
                n_match = sum(1 for hmm in qham if hmm <= TILE_MAX_HAMMING)
                out.append(
                    (iid, qham[0], qham[1], qham[2], qham[3], n_match, gham,
                     n_match >= TILE_MIN_QUADS, gham <= TILE_MAX_HAMMING)
                )
            yield pd.DataFrame(out, columns=[f.name for f in TILE_PHASH_SCHEMA.fields])

    return ids.select("image_id").mapInPandas(run, TILE_PHASH_SCHEMA)


EXIF_SCRUB_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("orientation", T.IntegerType(), False),
        T.StructField("had_gps", T.BooleanType(), False),
        T.StructField("n_before", T.LongType(), False),
        T.StructField("n_after", T.LongType(), False),
        T.StructField("clean_md5", T.StringType(), False),
    ]
)


def exif_scrub_gate(ids: DataFrame) -> DataFrame:
    """A15/A16 privacy pass: whitelist-scrub Exif before the corpus stores
    image bytes (rcspark.jpeg.scrub_exif_metadata — GPS, serials and every
    other IFD0 tag drop; Orientation survives because auto-orient consumes
    it). Fixture plants orientation 1..8 and, on ~2/3 of ids, a GPS IFD at
    id-derived micro-degree coordinates; the twin re-derives the SCRUB with
    its own marker walk + APP1 writer, so the planted bytes are data and
    the scrub logic is what the hash pins."""
    import hashlib

    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..jpeg import encode_jpeg, plant_exif, scrub_exif_metadata
    from ..xxh import xxh64

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                hv = xxh64(iid.encode())
                o = 1 + ((hv >> 16) % 8)
                gps = (
                    None
                    if (hv >> 8) % 3 == 0
                    else (
                        ((hv >> 13) % 180_000_000) - 90_000_000,
                        ((hv >> 17) % 360_000_000) - 180_000_000,
                    )
                )
                planted = plant_exif(
                    encode_jpeg(make_smooth_image(iid), quality=80), o, gps
                )
                clean, had_gps, o_read = scrub_exif_metadata(planted)
                assert o_read == o
                out.append(
                    (iid, o, had_gps, len(planted), len(clean),
                     hashlib.md5(clean).hexdigest())
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in EXIF_SCRUB_SCHEMA.fields]
            )

    return ids.select("image_id").mapInPandas(run, EXIF_SCRUB_SCHEMA)


# -- gray-world color-cast gate --------------------------------------------------
# [U gray-world white balance (Buchsbaum 1980); LAION image quality gates]
# Illumination-cast screening for an image+caption curation pipeline: under
# the gray-world assumption the channel means of a neutral photo agree, so
# a large max/min channel-sum ratio flags a color cast (scanner tint, night
# shots, decorative solid fills) before pixels reach a vision encoder. All
# arithmetic is exact int64 (sums + one floor division to per-mille), so
# the independent twin (scripts/gen_media_expected.expected_img_colorcast)
# reproduces every value bit-for-bit.

# Production gray-world screens fire around max/min > 1.2; the synthetic
# make_image corpus is near-neutral (ratio spread 1000-1197), so the
# registered gate pins the corpus-splitting 1030 (CLIP_GATE_MIN precedent)
# — the verdict machinery is threshold-independent, and the >1.2 semantics
# are pinned in pytest with planted tinted images via the parameter.
COLOR_CAST_PERMILLE = 1030

COLOR_CAST_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("dominant", T.StringType(), False),
        T.StructField("cast_ratio_permille", T.LongType(), False),
        T.StructField("cast", T.BooleanType(), False),
    ]
)


def color_cast_gate(
    images: DataFrame, permille: int = COLOR_CAST_PERMILLE
) -> DataFrame:
    """(image_id, bytes) → gray-world cast verdict (module comment).

    dominant = argmax channel sum with ties to the earlier channel in
    (r, g, b); cast_ratio_permille = 1000·max_sum // max(min_sum, 1).
    One numpy reduction per image, bytes dropped inside the UDF.
    """
    src = images.select("image_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                sums = pix.reshape(-1, 3).astype(np.int64).sum(axis=0)
                npx = pix.shape[0] * pix.shape[1]
                dom = "rgb"[int(np.argmax(sums))]  # argmax: first max wins
                ratio = 1000 * int(sums.max()) // max(int(sums.min()), 1)
                out.append(
                    (iid, int(sums[0]), int(sums[1]), int(sums[2]), npx,
                     dom, ratio, ratio > permille)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in COLOR_CAST_SCHEMA.fields]
            )

    return src.mapInPandas(run, COLOR_CAST_SCHEMA)


# -- PNG textual metadata (tEXt / iTXt) mining ------------------------------------
# [U PNG spec (RFC 2083 §4.2 / ISO 15948 §11.3.4); LAION alt-text mining]
# Web images carry captions INSIDE the container: PNG tEXt (Latin-1
# keyword/value) and iTXt (UTF-8 + language tag) chunks hold Title /
# Description / Comment strings that an image+caption acquisition plane
# mines alongside alt-text and OpenGraph. The planting side reuses the
# rcspark.png chunk writer (shared generator, like make_image); the
# EXTRACTOR below is an independent byte walk — length-driven, CRC-verified
# per chunk — so the plant→extract roundtrip cross-checks both against the
# oracle's arithmetic restatement of the planted values.

PNG_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("keyword", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def plant_png_text(k: int) -> bytes:
    """Deterministic 8×8 RGB PNG for id k with four planted text chunks:
    tEXt Title / Comment / Software + one iTXt Description (lang en,
    UTF-8 body with a non-ASCII char) spliced before IEND."""
    from ..png import _chunk, encode_png

    y, x, c = np.ogrid[0:8, 0:8, 0:3]
    pix = ((k * 31 + y * 7 + x * 13 + c * 29) % 256).astype(np.uint8)
    base = encode_png(pix)
    texts = [
        _chunk(b"tEXt", b"Title\x00" + f"Image {k} title card".encode("latin-1")),
        _chunk(b"tEXt", b"Comment\x00"
               + f"synthetic caption for {k} about part t{k % 97}".encode("latin-1")),
        _chunk(b"tEXt", b"Software\x00" + b"rcspark"),
        _chunk(b"iTXt", b"Description\x00\x00\x00en\x00\x00"
               + f"unicode caption {k} — ok".encode("utf-8")),
    ]
    return base[:-12] + b"".join(texts) + base[-12:]


def extract_png_text(data: bytes) -> list[tuple[str, str, str, str]]:
    """Independent chunk walk → [(src, keyword, lang, text)] for every
    tEXt/iTXt chunk; CRC-verifies each chunk it visits. tEXt rows carry
    lang '' (the spec gives tEXt no language field)."""
    import struct as st
    import zlib as zl

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    rows = []
    pos = 8
    while pos + 12 <= len(data):
        (length,) = st.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = st.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zl.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"tEXt":
            kw, _, txt = payload.partition(b"\x00")
            rows.append(("tEXt", kw.decode("latin-1"), "",
                         txt.decode("latin-1")))
        elif tag == b"iTXt":
            kw, _, rest = payload.partition(b"\x00")
            flag, method, rest = rest[0], rest[1], rest[2:]
            lang, _, rest = rest.partition(b"\x00")
            _trkw, _, body = rest.partition(b"\x00")
            if flag:  # compressed iTXt body
                if method != 0:
                    raise ValueError("iTXt unknown compression method")
                body = zl.decompress(body)
            rows.append(("iTXt", kw.decode("latin-1"),
                         lang.decode("ascii"), body.decode("utf-8")))
        elif tag == b"IEND":
            break
    return rows


def png_text_metadata(ids: DataFrame, id_col: str = "image_id") -> DataFrame:
    """ids → one row per planted tEXt/iTXt entry (module comment): build
    the PNG for each id (plant_png_text) and run the independent extractor
    over the real bytes. Caption gating happens downstream in the query
    (keyword whitelist + length floor) where it is SQL-expressible."""
    src = ids.select(F.col(id_col).cast("string").alias("image_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                data = plant_png_text(int(iid[3:]))
                for srcname, kw, lang, txt in extract_png_text(data):
                    out.append((iid, srcname, kw, lang, txt))
            yield pd.DataFrame(
                out, columns=[f.name for f in PNG_TEXT_SCHEMA.fields]
            )

    return src.mapInPandas(run, PNG_TEXT_SCHEMA)


# -- gradient-saliency smart crop ---------------------------------------------------
# [U img2dataset center-crop; smartcrop.js] Training-prep square cropping
# that keeps the busy region instead of the geometric center: the saliency
# proxy is the L1 gradient energy e[y,x] = |g[y,x+1]-g[y,x]| +
# |g[y+1,x]-g[y,x]| over the integer luma sum g = r+g+b, computed on the
# (h-1)×(w-1) interior grid. The crop is the min(w,h) square whose center
# chases the energy centroid (floor-division integer centroid over e-grid
# indices), clamped into bounds. All arithmetic int64 → the independent
# twin (scripts/gen_media_expected.expected_img_saliency) is bit-exact.

SALIENCY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("cx", T.LongType(), False),
        T.StructField("cy", T.LongType(), False),
        T.StructField("crop_top", T.LongType(), False),
        T.StructField("crop_left", T.LongType(), False),
        T.StructField("crop_size", T.LongType(), False),
        T.StructField("crop_digest", T.LongType(), False),
    ]
)


def saliency_crop(images: DataFrame) -> DataFrame:
    """(image_id, bytes) → saliency-centroid square crop (module comment).
    Degenerate all-flat images (zero total energy) fall back to the
    geometric center — the plain center-crop this upgrades."""
    from ..xxh import xxh64

    src = images.select("image_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                h, w, _ = pix.shape
                g = pix.astype(np.int64).sum(axis=2)
                dx = np.abs(g[:, 1:] - g[:, :-1])
                dy = np.abs(g[1:, :] - g[:-1, :])
                e = dx[: h - 1, :] + dy[:, : w - 1]
                tot = int(e.sum())
                if tot == 0:
                    cx, cy = w // 2, h // 2
                else:
                    xs = np.arange(w - 1, dtype=np.int64)
                    ys = np.arange(h - 1, dtype=np.int64)
                    cx = int((e.sum(axis=0) * xs).sum()) // tot
                    cy = int((e.sum(axis=1) * ys).sum()) // tot
                size = min(w, h)
                top = min(max(cy - size // 2, 0), h - size)
                left = min(max(cx - size // 2, 0), w - size)
                crop = pix[top : top + size, left : left + size]
                u = xxh64(np.ascontiguousarray(crop).tobytes())
                out.append(
                    (iid, cx, cy, top, left, size,
                     u - (1 << 64) if u >= (1 << 63) else u)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in SALIENCY_SCHEMA.fields]
            )

    return src.mapInPandas(run, SALIENCY_SCHEMA)


# -- median-cut palette quantization -----------------------------------------------
# [U Heckbert 1982 "Color Image Quantization"; PIL Image.quantize] The
# classic palette builder, pinned fully deterministic so the independent
# twin (scripts/gen_media_expected.expected_img_palette) re-derives it
# bit-for-bit from the written rules:
#   - start with one box of ALL pixels (duplicates kept);
#   - 4 rounds: split EVERY box with >1 distinct color (boxes with one
#     color pass through), longest-range channel first (ties r > g > b),
#     pixels ordered by (that channel, packed rgb), lower-median split
#     (first half = len//2 pixels);
#   - palette entry per box = floor mean per channel, entries sorted by
#     packed rgb;
#   - each pixel contributes its L2 distance to the NEAREST entry to the
#     exact integer SSE (min distance only — tie identity is irrelevant).

PALETTE_ROUNDS = 4

PALETTE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("n_colors", T.IntegerType(), False),
        T.StructField("palette_digest", T.LongType(), False),
        T.StructField("sse", T.LongType(), False),
    ]
)


def median_cut_palette(pix: "np.ndarray", rounds: int = PALETTE_ROUNDS) -> list[int]:
    """(h, w, 3) uint8 → sorted packed-rgb palette per the module rules."""
    flat = pix.reshape(-1, 3).astype(np.int64)
    boxes = [flat]
    for _ in range(rounds):
        nxt = []
        for b in boxes:
            packed = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
            if np.unique(packed).size <= 1:
                nxt.append(b)
                continue
            rng = b.max(axis=0) - b.min(axis=0)
            ax = int(np.argmax(rng))  # first max wins: r > g > b on ties
            order = np.lexsort((packed, b[:, ax]))
            half = b.shape[0] // 2
            nxt.append(b[order[:half]])
            nxt.append(b[order[half:]])
        boxes = nxt
    pal = sorted(
        (int(m[0]) << 16) | (int(m[1]) << 8) | int(m[2])
        for m in (bx.sum(axis=0) // bx.shape[0] for bx in boxes)
    )
    return pal


def palette_quantize_stats(images: DataFrame) -> DataFrame:
    """(image_id, bytes) → median-cut palette census: distinct palette
    size, digest of the sorted packed palette, exact integer SSE of the
    nearest-entry mapping."""
    from ..xxh import xxh64

    src = images.select("image_id", "bytes")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                pix, _ = decode_image(bytes(data))
                pal = sorted(set(median_cut_palette(pix)))
                pc = np.array(
                    [[(p >> 16) & 255, (p >> 8) & 255, p & 255] for p in pal],
                    dtype=np.int64,
                )
                flat = pix.reshape(-1, 3).astype(np.int64)
                d = ((flat[:, None, :] - pc[None, :, :]) ** 2).sum(axis=2)
                sse = int(d.min(axis=1).sum())
                u = xxh64(",".join(str(p) for p in pal).encode())
                out.append(
                    (iid, len(pal),
                     u - (1 << 64) if u >= (1 << 63) else u, sse)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in PALETTE_SCHEMA.fields]
            )

    return src.mapInPandas(run, PALETTE_SCHEMA)


# -- shared-patch (watermark / template) detection -----------------------------------
# [U LAION watermark filtering; Common Crawl boilerplate motifs] Images
# from templated sites share EXACT pixel blocks (logos, header/footer
# chrome) even when the photos differ; block-level signatures catch what
# whole-image phash cannot (one shared 4×4 logo moves a 64-bit phash by
# at most a bit or two — and a detector thresholded that tight drowns in
# false pairs). The fixture corpus is built from per-block seeds
# (splitmix64 streams — numpy-vectorized, shared generator):
#   i = partkey // 10 (the image index); 32×32 RGB = 8×8 grid of 4×4
#   blocks; block seed = k·1000003 + bx·8191 + by·131 (collision-free by
#   range separation), then OVERRIDES in this order: i%5==0 plants the
#   LOGO block (seed 777000001) at ((i·37)%8, (i·53)%8); i%7==0 plants
#   HDR (777000002) at (0,0) and FTR (777000003) at (7,7) — later plants
#   overwrite earlier ones on position collision.
# The extractor digests the PIXELS of every block (xxh64, signed), so the
# signature rows cross-check construction + extraction against the
# independent twin (scripts/gen_media_expected.expected_img_blocks).

PATCH_GRID = 8
PATCH_PX = 4
_PATCH_LOGO_SEED = 777000001
_PATCH_HDR_SEED = 777000002
_PATCH_FTR_SEED = 777000003

PATCH_SIG_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bx", T.IntegerType(), False),
        T.StructField("by", T.IntegerType(), False),
        T.StructField("block_sig", T.LongType(), False),
    ]
)


def patch_block_seeds(k: int) -> dict[tuple[int, int], int]:
    """(bx, by) → seed per the module rules (shared construction)."""
    i = k // 10
    seeds = {
        (bx, by): k * 1000003 + bx * 8191 + by * 131
        for bx in range(PATCH_GRID) for by in range(PATCH_GRID)
    }
    if i % 5 == 0:
        seeds[((i * 37) % 8, (i * 53) % 8)] = _PATCH_LOGO_SEED
    if i % 7 == 0:
        seeds[(0, 0)] = _PATCH_HDR_SEED
        seeds[(7, 7)] = _PATCH_FTR_SEED
    return seeds


def build_patch_image(k: int) -> "np.ndarray":
    """32×32×3 uint8 from the block-seed map (splitmix64 byte streams)."""
    from ..xxh import splitmix64

    img = np.zeros((PATCH_GRID * PATCH_PX, PATCH_GRID * PATCH_PX, 3),
                   dtype=np.uint8)
    n64 = (PATCH_PX * PATCH_PX * 3 + 7) // 8
    for (bx, by), seed in patch_block_seeds(k).items():
        words = splitmix64(
            np.arange(n64, dtype=np.uint64) + np.uint64(seed) * np.uint64(48)
        )
        block = words.view(np.uint8)[: PATCH_PX * PATCH_PX * 3].reshape(
            PATCH_PX, PATCH_PX, 3
        )
        img[by * PATCH_PX:(by + 1) * PATCH_PX,
            bx * PATCH_PX:(bx + 1) * PATCH_PX] = block
    return img


def patch_signatures(ids: DataFrame, id_col: str = "image_id") -> DataFrame:
    """ids → one row per 4×4 block: xxh64 signature of the block PIXELS
    (signed int64). Extraction slices the assembled image — the twin
    re-derives via a reshape/transpose path."""
    from ..xxh import xxh64

    src = ids.select(F.col(id_col).cast("string").alias("image_id"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                img = build_patch_image(int(iid[3:]))
                for by in range(PATCH_GRID):
                    for bx in range(PATCH_GRID):
                        blk = img[by * PATCH_PX:(by + 1) * PATCH_PX,
                                  bx * PATCH_PX:(bx + 1) * PATCH_PX]
                        u = xxh64(np.ascontiguousarray(blk).tobytes())
                        out.append(
                            (iid, bx, by,
                             u - (1 << 64) if u >= (1 << 63) else u)
                        )
            yield pd.DataFrame(
                out, columns=[f.name for f in PATCH_SIG_SCHEMA.fields]
            )

    return src.mapInPandas(run, PATCH_SIG_SCHEMA)


# -- streaming pair-manifest features --------------------------------------------------
# [U img2dataset streaming ingest] The one Arrow pass a STREAMING pair
# manifest needs: given (image_id, caption) rows arriving on a stream,
# synthesize/fetch the image, decode once, and emit the decode-derived
# gate inputs (w, h, fmt, phash, gray-world cast) with the caption riding
# through — so every downstream manifest gate stays a codegen projection
# and the whole cascade runs identically in batch and streaming
# (pinned: stream_pair_manifest vs img_pair_manifest row equality).

PAIR_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("cast", T.BooleanType(), False),
    ]
)


def pair_stream_features(
    pairs: DataFrame, permille: int = COLOR_CAST_PERMILLE
) -> DataFrame:
    """(image_id, caption) → + decode-derived manifest gate inputs."""
    from ..fixtures import make_image

    src = pairs.select("image_id", "caption")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, cap in zip(pdf["image_id"], pdf["caption"]):
                data, _, _, _, _ = make_image(iid)
                pix, fmt = decode_image(data)
                sums = pix.reshape(-1, 3).astype(np.int64).sum(axis=0)
                ratio = 1000 * int(sums.max()) // max(int(sums.min()), 1)
                out.append(
                    (iid, cap, pix.shape[1], pix.shape[0], fmt,
                     phash64(pix), ratio > permille)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in PAIR_FEATURES_SCHEMA.fields]
            )

    return src.mapInPandas(run, PAIR_FEATURES_SCHEMA)


# -- IFD1 embedded EXIF thumbnail (round-5 batch 41) -------------------------------
# [U Exif 2.32 §4.6.3 (1st IFD); PIL .thumbnail / piexif "1st" IFD;
# scrapy ImagesPipeline stores thumbs beside images]: cameras embed a
# small JPEG of the ORIGINAL frame inside the Exif APP1. Two corpus jobs
# need it: (a) acquisition can read the embedded thumb instead of decoding
# the full image for gating; (b) privacy — the thumb leaks anything a
# crop/redact removed, so the scrub pass must strip IFD1 (and this
# operator PROVES it does, per row, from the bytes).

EXIF_THUMB_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("orientation", T.IntegerType(), False),
        T.StructField("thumb_w", T.IntegerType(), False),
        T.StructField("thumb_h", T.IntegerType(), False),
        T.StructField("n_thumb_bytes", T.LongType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("scrub_strips_thumb", T.BooleanType(), False),
    ]
)


def exif_thumbnail(ids: DataFrame, max_side: int = 12, quality: int = 85) -> DataFrame:
    """Plant a REAL IFD1 thumbnail (aspect-fit int_block_mean + engine
    JPEG, spliced by rcspark.jpeg.plant_exif_thumbnail), then re-extract
    it FROM THE BYTES, decode it, and report dims/sums; also run the
    whitelist scrub and assert per-row that the thumbnail is gone.
    max_side stays below the smallest fixture dim (16): a thumbnail never
    upscales (PIL Image.thumbnail semantics), and int_block_mean requires
    out <= src or block spans go empty. Twin:
    scripts/gen_media_expected.py walks the APP1 with its own IFD parser
    and decodes with scripts/jpeg_twin.py."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..jpeg import (
        decode_jpeg,
        encode_jpeg,
        plant_exif_thumbnail,
        read_exif_thumbnail,
        scrub_exif_metadata,
    )
    from ..xxh import xxh64

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid in pdf["image_id"]:
                pix = make_smooth_image(iid)
                h, w, _ = pix.shape
                planted_o = 1 + xxh64(iid.encode()) % 8
                tw, th = fit_box(w, h, max_side, max_side)
                tpix = int_block_mean(pix, th, tw)
                tb = encode_jpeg(tpix, quality=quality)
                data = plant_exif_thumbnail(
                    encode_jpeg(pix, quality=90), planted_o, tb
                )
                etb, o = read_exif_thumbnail(data)
                dec = decode_jpeg(etb)
                s = dec.reshape(-1, 3).astype(np.int64).sum(axis=0)
                scrubbed, _, _ = scrub_exif_metadata(data)
                out.append(
                    (iid, o, dec.shape[1], dec.shape[0], len(etb),
                     int(s[0]), int(s[1]), int(s[2]),
                     read_exif_thumbnail(scrubbed)[0] is None)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in EXIF_THUMB_SCHEMA.fields]
            )

    return ids.select("image_id").mapInPandas(run, EXIF_THUMB_SCHEMA)


# -- skin-ratio safety heuristic (round-5 batch 41) --------------------------------
# [U Peer/Kovac/Solina RGB skin rule; LAION NSFW-filter practice]: the
# cheap first tier of a pair safety gate — flag images whose skin-tone
# pixel share exceeds a threshold, BEFORE any model runs (the model tier
# binds behind the same seam as decode_external). Rule, exact integer on
# uint8: R>95, G>40, B>20, max-min>15, |R-G|>15, R>G, R>B. The fixture
# plants a skin-toned blend for every xxh64(id||':skin')%3==0 image:
# p' = (p + 2*(205,140,110)) // 3 — generator-side arithmetic shared with
# the twin (like make_image), while the MASK is computed independently.

SKIN_TARGET = (205, 140, 110)
SKIN_FLAG_PPM = 400_000

SKIN_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("planted", T.BooleanType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("skin_px", T.LongType(), False),
        T.StructField("skin_ppm", T.LongType(), False),
        T.StructField("skin_flag", T.BooleanType(), False),
    ]
)


def skin_gate(
    ids: DataFrame, flag_ppm: int = SKIN_FLAG_PPM, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Per-image skin-tone pixel share in exact ppm (module comment).
    One vectorized numpy mask per image; bytes never leave the UDF.
    ``carry`` columns ride through unchanged (streaming callers carry the
    caption so no stream-stream join is needed)."""
    import pandas as pd

    from ..fixtures import make_smooth_image
    from ..xxh import xxh64

    tgt = np.array(SKIN_TARGET, dtype=np.int64)
    schema = T.StructType(
        list(SKIN_SCHEMA.fields)
        + [T.StructField(c, T.StringType(), True) for c in carry]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                iid = row.image_id
                pix = make_smooth_image(iid).astype(np.int64)
                planted = xxh64(f"{iid}:skin".encode()) % 3 == 0
                if planted:
                    pix = (pix + 2 * tgt) // 3
                r, g, b = pix[..., 0], pix[..., 1], pix[..., 2]
                mx = np.maximum(np.maximum(r, g), b)
                mn = np.minimum(np.minimum(r, g), b)
                mask = (
                    (r > 95) & (g > 40) & (b > 20)
                    & (mx - mn > 15) & (np.abs(r - g) > 15)
                    & (r > g) & (r > b)
                )
                n = pix.shape[0] * pix.shape[1]
                skin = int(mask.sum())
                ppm = 1_000_000 * skin // n
                out.append(
                    (iid, planted, n, skin, ppm, ppm > flag_ppm)
                    + tuple(getattr(row, c) for c in carry)
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return ids.select("image_id", *carry).mapInPandas(run, schema)
