"""Generate expected-values parquet for the 4 media queries (VERDICT r1 #2).

The media operators (image feature extraction, lossy re-encode PSNR, video
frame sampling, audio feature extraction) are deterministic functions of the
id, but their codecs are not expressible in DuckDB SQL.  This script is the
*independent numpy twin*: it re-implements the decode + feature math from the
documented container/codec specs (container formats per
rcspark/datapipe/multimodal.py module docs, codec spec per rcspark/codecs.py
module docs) WITHOUT calling the engine's transform functions, and writes the
expected rows to tests/data/media_expected/*.parquet.  The driver's DuckDB
oracle then JOINs those parquet files against the `part` view, so the media
queries get real rows+schema+hash checks instead of err=no_oracle.

Shared with the engine on purpose: the *generators* (make_image /
synthesize_* are the data source both sides consume, like the testdata
parquet) and np.fft.rfft (re-implementing an FFT would add nothing).  The
*transforms* — header parsing, channel means, phash, PSNR, quantization,
frame sampling, RMS/ZCR — are re-implemented here with different code paths
over exact-integer reductions, which is what makes the doubles
bit-reproducible across both implementations.

Coverage: ids derived from p_partkey 0..19999 (sf0.1, the largest testdata
tier), so the oracle join works at any sf the driver picks.

Usage: python scripts/gen_media_expected.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcspark.fixtures import make_image  # noqa: E402 — shared data generator
from rcspark.xxh import xxh64  # noqa: E402 — shared id hash (generator side)

MAX_PARTKEY = 20000  # sf0.1 part has p_partkey 0..19999


# --------------------------------------------------------------------------
# Independent re-implementations (the "twin") — no rcspark.codecs /
# rcspark.datapipe.multimodal transform imports.
# --------------------------------------------------------------------------

def twin_decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Parse 'P6|Q6\\nW H\\n255\\n' + raw RGB bytes (spec: rcspark/codecs.py)."""
    fmt = {b"P6": "ppm", b"Q6": "qppm"}[data[:2]]
    header_rest = data.split(b"\n", 3)
    w, h = (int(v) for v in header_rest[1].split())
    pix = np.frombuffer(header_rest[3], dtype=np.uint8, count=w * h * 3)
    return pix.reshape(h, w, 3), fmt


def twin_quantize(pix: np.ndarray) -> np.ndarray:
    """6-bit per-channel quantization with mid-step reconstruction:
    clear low 2 bits, set the mid-step bit (== ((p>>2)<<2)|2)."""
    return ((pix & np.uint8(0xFC)) | np.uint8(0x02)).astype(np.uint8)


def twin_phash(pix: np.ndarray) -> int:
    """8x8 average-hash, vectorized via reduceat block sums (engine uses a
    per-cell loop; both reduce to exact-int-sum / count divisions)."""
    g = pix.astype(np.int64).sum(axis=2) // 3
    h, w = g.shape
    ys = np.linspace(0, h, 9, dtype=np.int64)
    xs = np.linspace(0, w, 9, dtype=np.int64)
    rows = np.add.reduceat(g, ys[:-1], axis=0)
    blocks = np.add.reduceat(rows, xs[:-1], axis=1).astype(np.float64)
    counts = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    cells = blocks / counts
    bits = (cells > cells.mean()).flatten()
    v = int("".join("1" if b else "0" for b in bits), 2)
    return v - (1 << 64) if v >= (1 << 63) else v


def twin_psnr(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.int64) - b.astype(np.int64)
    sse = int((d * d).sum())
    if sse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(sse / d.size))


def expected_img_features() -> pd.DataFrame:
    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, fmt = twin_decode_image(data)
        h, w, _ = pix.shape
        sums = pix.astype(np.int64).sum(axis=(0, 1))
        npx = h * w
        rows.append(
            (iid, np.int32(w), np.int32(h), fmt,
             round(float(sums[0] / npx), 4),
             round(float(sums[1] / npx), 4),
             round(float(sums[2] / npx), 4),
             np.int64(twin_phash(pix))))
    return pd.DataFrame(
        rows,
        columns=["image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b", "phash"],
    ).astype({"w": "int32", "h": "int32", "phash": "int64"})


def expected_img_reencode() -> pd.DataFrame:
    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        h, w, _ = pix.shape
        q = twin_quantize(pix)
        p = twin_psnr(pix, q)
        rows.append(
            (iid, np.int32(w), np.int32(h), round(min(p, 99.0), 4),
             np.int64(twin_phash(q)))
        )
    return pd.DataFrame(
        rows, columns=["image_id", "out_w", "out_h", "psnr_db", "phash"]
    ).astype({"out_w": "int32", "out_h": "int32", "phash": "int64"})


def expected_video_frames(max_frames: int = 24, every_k: int = 4) -> pd.DataFrame:
    """Frame content is a pure function of (id): n = 4 + h64 % (max-3),
    16x16 RGB frames from the id-seeded Generator (spec: synthesize_videos).
    The sampling transform (idx 0, k, 2k, ... + per-frame phash) is the
    re-implemented part."""
    rows = []
    for k in range(0, MAX_PARTKEY, 20):
        vid = f"vid{k}"
        h64 = xxh64(vid.encode())
        n = 4 + h64 % (max_frames - 3)
        rng = np.random.default_rng(h64 & 0xFFFFFFFF)
        frames = rng.integers(0, 256, (n, 16, 16, 3), dtype=np.uint8)
        for idx in range(0, n, every_k):
            rows.append(
                (vid, np.int32(idx), np.int32(n), np.int32(16), np.int32(16),
                 np.int64(twin_phash(frames[idx]))))
    return pd.DataFrame(
        rows, columns=["video_id", "frame_idx", "n_frames", "w", "h", "phash"]
    ).astype({"frame_idx": "int32", "n_frames": "int32", "w": "int32",
              "h": "int32", "phash": "int64"})


def expected_scene_cuts(threshold_permille: int = 150) -> pd.DataFrame:
    """Scene-cut twin: the shot-structured frame stack is the SHARED
    generator (rcspark.fixtures.make_shot_frames, like make_image); the
    re-implemented transform is the consecutive-frame integer MAD in
    permille and the threshold flag — computed here per-channel with a
    Python int accumulator (different reduction path than the engine's
    single int64 numpy sum)."""
    from rcspark.fixtures import make_shot_frames  # shared data generator

    rows = []
    for k in range(5, MAX_PARTKEY, 20):
        vid = f"sv{k}"
        frames = make_shot_frames(vid).astype(np.int32)
        n, h, w, _ = frames.shape
        denom = h * w * 3 * 255
        for i in range(1, n):
            mad = 0
            for c in range(3):
                mad += int(abs(frames[i, :, :, c] - frames[i - 1, :, :, c]).sum())
            dpm = (1000 * mad) // denom
            rows.append((vid, np.int32(i), np.int64(dpm),
                         bool(dpm >= threshold_permille)))
    return pd.DataFrame(
        rows, columns=["video_id", "frame_idx", "diff_permille", "is_cut"]
    ).astype({"frame_idx": "int32", "diff_permille": "int64"})


def expected_audio_features() -> pd.DataFrame:
    """Clip content per synthesize_audio spec (0.5 s @ 8 kHz sine + noise);
    RMS / ZCR / dominant-frequency transforms re-implemented over exact
    integer reductions (np.fft.rfft shared — see module doc)."""
    rows = []
    for k in range(0, MAX_PARTKEY, 20):
        aid = f"aud{k}"
        h64 = xxh64(aid.encode())
        rate, n = 8000, 4000
        freq = 100.0 + (h64 % 1900)
        t = np.arange(n) / rate
        rng = np.random.default_rng(h64 & 0xFFFFFFFF)
        wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
        s = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        s64 = s.astype(np.int64)
        ss = int((s64 * s64).sum())
        rms = float(np.sqrt(ss / n) / 32767.0)
        neg = s < 0
        zcr = float(int((neg[1:] != neg[:-1]).sum()) / (n - 1))
        x = s.astype(np.float64) / 32767.0
        spec = np.abs(np.fft.rfft(x))
        spec[0] = 0.0
        dom = float(np.argmax(spec) * rate / n)
        rows.append(
            (aid, np.int32(rate), np.int32(n), round(n / rate, 6),
             round(rms, 6), round(zcr, 6), round(dom, 3)))
    return pd.DataFrame(
        rows,
        columns=["audio_id", "rate", "n_samples", "duration_s", "rms",
                 "zero_cross_rate", "dominant_hz"],
    ).astype({"rate": "int32", "n_samples": "int32"})


def expected_wav_features() -> pd.DataFrame:
    """Real-RIFF/WAV twin (batch 56): clip content per the documented
    synthesize_audio law (0.5 s @ 8 kHz sine + noise) regenerated from the
    spec; features over exact-integer reductions as in
    expected_audio_features; title per the documented 'clip:<id>' law.
    The CONTAINER side is pinned separately in tests/test_batch56.py:
    stdlib `wave` reads the engine's RIFF bytes sample-exact and the
    engine decodes stdlib-written bytes — so this twin only restates the
    decoded-content contract, never touching rcspark.wav."""
    rows = []
    for k in range(5, MAX_PARTKEY, 20):
        aid = f"wav{k}"
        h64 = xxh64(aid.encode())
        rate, n = 8000, 4000
        freq = 100.0 + (h64 % 1900)
        t = np.arange(n) / rate
        rng = np.random.default_rng(h64 & 0xFFFFFFFF)
        wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
        s = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        s64 = s.astype(np.int64)
        ss = int((s64 * s64).sum())
        rms = float(np.sqrt(ss / n) / 32767.0)
        neg = s < 0
        zcr = float(int((neg[1:] != neg[:-1]).sum()) / (n - 1))
        x = s.astype(np.float64) / 32767.0
        spec = np.abs(np.fft.rfft(x))
        spec[0] = 0.0
        dom = float(np.argmax(spec) * rate / n)
        rows.append(
            (aid, np.int32(rate), np.int32(n), round(n / rate, 6),
             round(rms, 6), round(zcr, 6), round(dom, 3), f"clip:{aid}"))
    return pd.DataFrame(
        rows,
        columns=["audio_id", "rate", "n_samples", "duration_s", "rms",
                 "zero_cross_rate", "dominant_hz", "title"],
    ).astype({"rate": "int32", "n_samples": "int32"})


def expected_img_textdensity() -> pd.DataFrame:
    """Text-overlay twin (batch 59): shared make_text_overlay_image
    generator; the transition counting re-implemented row-by-row with
    scalar int arithmetic (documented luma formula (77r+150g+29b)>>8,
    jump >40, text row at >= w//8 transitions) instead of the engine's
    vectorized diff. Emits RAW counts only — ppm + gate arithmetic is the
    oracle SQL's job."""
    from rcspark.fixtures import make_text_overlay_image

    rows = []
    for k in range(3, MAX_PARTKEY, 10):
        item_ids = [f"p:img{k}"]
        if k % 20 == 3:
            item_ids.append(f"tx:img{k}")
        for iid in item_ids:
            pix = make_text_overlay_image(iid)
            h, w = pix.shape[:2]
            n_text = 0
            for y in range(h):
                prev = None
                trans = 0
                for x in range(w):
                    r, g, b = (int(pix[y, x, 0]), int(pix[y, x, 1]),
                               int(pix[y, x, 2]))
                    lum = (77 * r + 150 * g + 29 * b) >> 8
                    if prev is not None and abs(lum - prev) > 40:
                        trans += 1
                    prev = lum
                if trans >= w // 8:
                    n_text += 1
            rows.append((iid, np.int32(h), np.int32(w), np.int32(n_text)))
    return pd.DataFrame(
        rows, columns=["item_id", "h", "w", "n_text_rows"]
    ).astype({"h": "int32", "w": "int32", "n_text_rows": "int32"})


def expected_img_bicubic() -> pd.DataFrame:
    """Exact-integer bicubic twin (batch 62): shared make_smooth_image
    generator; the Catmull-Rom fixed-point kernel re-implemented with
    SCALAR per-pixel loops straight from the documented weight
    polynomials (multimodal.py module-section spec) — no einsum/gather.
    Must be bit-identical to the engine (single +2^49 >> 50 rounding)."""
    from rcspark.datapipe.hashing import digest60_py
    from rcspark.fixtures import make_smooth_image

    def wts(f):
        f2, f3 = f * f, f * f * f
        return (
            -f3 + 512 * f2 - 65536 * f,
            3 * f3 - 1280 * f2 + 33554432,
            -3 * f3 + 1024 * f2 + 65536 * f,
            f3 - 256 * f2,
        )

    def taps(n_in, n_out, o):
        x256 = ((2 * o + 1) * n_in * 128) // n_out - 128
        base, frac = x256 >> 8, x256 & 255
        idx = [min(max(base + d, 0), n_in - 1) for d in (-1, 0, 1, 2)]
        return idx, wts(frac)

    rows = []
    for k in range(7, MAX_PARTKEY, 10):
        iid = f"img{k}"
        pix = make_smooth_image(iid).astype(int)
        h, w = pix.shape[:2]
        wo, ho = w // 2, h // 2
        out = np.zeros((ho, wo, 3), dtype=np.uint8)
        xtaps = [taps(w, wo, xo) for xo in range(wo)]
        ytaps = [taps(h, ho, yo) for yo in range(ho)]
        for yo in range(ho):
            yi, yw = ytaps[yo]
            for xo in range(wo):
                xi, xw = xtaps[xo]
                for c in range(3):
                    acc = 0
                    for ky in range(4):
                        hacc = 0
                        for kx in range(4):
                            hacc += xw[kx] * int(pix[yi[ky], xi[kx], c])
                        acc += yw[ky] * hacc
                    v = (acc + (1 << 49)) >> 50
                    out[yo, xo, c] = min(max(v, 0), 255)
        cpx = out[ho // 2, wo // 2]
        rows.append(
            (iid, np.int32(w), np.int32(h), np.int32(wo), np.int32(ho),
             digest60_py(out.tobytes().hex()),
             np.int32(cpx[0]), np.int32(cpx[1]), np.int32(cpx[2]))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "w_in", "h_in", "w_out", "h_out", "px_digest",
                 "c_r", "c_g", "c_b"],
    ).astype({c: "int32" for c in ["w_in", "h_in", "w_out", "h_out",
                                   "c_r", "c_g", "c_b"]})


def expected_audio_bands() -> pd.DataFrame:
    """Band-energy twin (batch 72): clip content regenerated from the
    documented synthesize law ('bnd' ids, 0.5 s @ 8 kHz sine + noise);
    np.fft.rfft shared per the media-twin convention; the per-bin round
    and the band sums re-done with a plain Python int loop."""
    rows = []
    for k in range(10, MAX_PARTKEY, 20):
        aid = f"bnd{k}"
        h64 = xxh64(aid.encode())
        rate, n = 8000, 4000
        freq = 100.0 + (h64 % 1900)
        t = np.arange(n) / rate
        rng = np.random.default_rng(h64 & 0xFFFFFFFF)
        wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
        s = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        x = s.astype(np.float64) / 32767.0
        spec = np.fft.rfft(x)
        bands = [0] * 8
        nbins = len(spec) - 1
        # same documented bounds rule as the engine (1 + nbins*b//8),
        # applied by scanning per bin instead of slicing
        bounds = [1 + nbins * b // 8 for b in range(9)]
        for i in range(1, len(spec)):
            e = int(round(spec.real[i] ** 2 + spec.imag[i] ** 2))
            b = max(bb for bb in range(8) if bounds[bb] <= i)
            bands[b] += e
        total = max(sum(bands), 1)
        for b in range(8):
            rows.append(
                (aid, np.int32(b), bands[b], 1_000_000 * bands[b] // total)
            )
    return pd.DataFrame(
        rows, columns=["audio_id", "band", "energy", "share_ppm"]
    ).astype({"band": "int32"})


def expected_img_patchify(patch: int = 12) -> pd.DataFrame:
    """Patchify twin: same shared make_image generator; the crop / patch-sum
    reduction is re-implemented via np.add.reduceat block sums (the engine
    reshapes to (gh, p, gw, p)) and total luma via per-channel Python-int
    accumulation; the canonical-string digest (shared xxh64, like np.fft)
    is recomputed over the independently derived patch sums."""
    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        h, w, _ = pix.shape
        gh, gw = h // patch, w // patch
        top, left = (h - gh * patch) // 2, (w - gw * patch) // 2
        crop = pix[top : top + gh * patch, left : left + gw * patch]
        luma = (
            crop[:, :, 0].astype(np.int64)
            + crop[:, :, 1].astype(np.int64)
            + crop[:, :, 2].astype(np.int64)
        )
        ys = np.arange(0, gh * patch, patch)
        xs = np.arange(0, gw * patch, patch)
        ps = np.add.reduceat(np.add.reduceat(luma, ys, axis=0), xs, axis=1)
        total = int(crop[:, :, 0].sum()) + int(crop[:, :, 1].sum()) + int(
            crop[:, :, 2].sum()
        )
        seq = ",".join(str(int(v)) for v in ps.flatten())
        dig = xxh64(seq.encode())
        dig = dig - (1 << 64) if dig >= (1 << 63) else dig
        rows.append(
            (iid, np.int32(gw), np.int32(gh), np.int32(gh * gw),
             np.int32(top), np.int32(left), np.int64(total), np.int64(dig))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "grid_w", "grid_h", "n_patches", "crop_top",
                 "crop_left", "total_luma", "patch_digest"],
    ).astype({"grid_w": "int32", "grid_h": "int32", "n_patches": "int32",
              "crop_top": "int32", "crop_left": "int32",
              "total_luma": "int64", "patch_digest": "int64"})


def expected_audio_vad(frame_len: int = 160, thresh: int = 1_000_000) -> pd.DataFrame:
    """VAD twin: shared make_speech_samples generator; frame mean-square via
    a per-sample Python-int accumulator and the voiced-segment merge via an
    explicit state machine (the engine vectorizes both)."""
    from rcspark.fixtures import make_speech_samples  # shared data generator

    rows = []
    for k in range(10, MAX_PARTKEY, 20):
        aid = f"sp{k}"
        s = make_speech_samples(aid)
        nf = len(s) // frame_len
        ms = []
        for f in range(nf):
            acc = 0
            for v in s[f * frame_len : (f + 1) * frame_len]:
                iv = int(v)
                acc += iv * iv
            ms.append(acc // frame_len)
        seg_idx, start, in_seg, acc_ms = 0, 0, False, 0
        for f in range(nf + 1):
            voiced = f < nf and ms[f] >= thresh
            if voiced and not in_seg:
                in_seg, start, acc_ms = True, f, 0
            if voiced:
                acc_ms += ms[f]
            if not voiced and in_seg:
                in_seg = False
                seg_idx += 1
                n = f - start
                rows.append(
                    (aid, np.int32(seg_idx), np.int32(start), np.int32(f - 1),
                     np.int32(n), np.int64(acc_ms // n))
                )
    return pd.DataFrame(
        rows,
        columns=["audio_id", "seg_idx", "start_frame", "end_frame",
                 "n_frames", "meansq_mean"],
    ).astype({"seg_idx": "int32", "start_frame": "int32", "end_frame": "int32",
              "n_frames": "int32", "meansq_mean": "int64"})


def expected_img_sharpness() -> pd.DataFrame:
    """Sharpness twin over originals ('o:') and their 2×2 box-blurred
    variants ('b:').  Re-implemented paths: blur via reduceat block sums +
    np.kron upsample (engine reshapes + np.repeat); Laplacian via
    np.diff(n=2) second differences (engine uses explicit 4-neighbor slice
    arithmetic: 4c−u−d−l−r ≡ −(d²y + d²x)); energy via per-row Python-int
    accumulation (engine does one vectorized int64 reduction)."""
    def twin_blur(pix: np.ndarray) -> np.ndarray:
        h, w, _ = pix.shape
        out = np.empty((h // 2, w // 2, 3), dtype=np.uint8)
        for ch in range(3):
            rows = np.add.reduceat(pix[:, :, ch].astype(np.int64),
                                   np.arange(0, h, 2), axis=0)
            blocks = np.add.reduceat(rows, np.arange(0, w, 2), axis=1)
            out[:, :, ch] = (blocks // 4).astype(np.uint8)
        return np.kron(out, np.ones((2, 2, 1), dtype=np.uint8))

    def twin_lap_rows(pix: np.ndarray) -> tuple[int, int]:
        c = pix.astype(np.int64).sum(axis=2)
        d2y = np.diff(c, n=2, axis=0)[:, 1:-1]
        d2x = np.diff(c, n=2, axis=1)[1:-1, :]
        lap = -(d2y + d2x)
        energy = 0
        for row in lap:
            for v in row:
                iv = int(v)
                energy += iv * iv
        return energy, lap.size

    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        h, w, _ = pix.shape
        for prefix, p in (("o:", pix), ("b:", twin_blur(pix))):
            energy, n = twin_lap_rows(p)
            rows.append(
                (prefix + iid, np.int32(w), np.int32(h),
                 np.int64(energy), np.int64(n), np.int64(energy // n))
            )
    return pd.DataFrame(
        rows,
        columns=["item_id", "w", "h", "lap_energy", "n_interior", "lap_meansq"],
    ).astype({"w": "int32", "h": "int32", "lap_energy": "int64",
              "n_interior": "int64", "lap_meansq": "int64"})


def expected_audio_clipping(gain: int = 4) -> pd.DataFrame:
    """Clipping-gate twin over originals ('o:') and ×gain hard-clipped
    variants ('g:').  Clip content per the synthesize_audio spec (0.5 s @
    8 kHz sine + noise — same regeneration as expected_audio_features);
    the re-implemented transforms: the gained signal is NEVER materialized
    — a sample clips iff |s| ≥ ceil(32767/gain) — and the clipped count /
    peak run through per-sample Python-int accumulation (the engine
    vectorizes a materialized gained signal)."""
    rows = []
    clip_floor = -(-32767 // gain)  # ceil: |s| >= this clips after ×gain
    for k in range(0, MAX_PARTKEY, 20):
        aid = f"aud{k}"
        h64 = xxh64(aid.encode())
        rate, n = 8000, 4000
        freq = 100.0 + (h64 % 1900)
        t = np.arange(n) / rate
        rng = np.random.default_rng(h64 & 0xFFFFFFFF)
        wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
        s = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        for prefix, thresh, peak_fn in (
            ("o:", 32767, lambda v: abs(int(v))),
            ("g:", clip_floor, lambda v: min(abs(int(v)) * gain, 32767)),
        ):
            n_clipped, peak = 0, 0
            for v in s:
                av = abs(int(v))
                if av >= thresh:
                    n_clipped += 1
                p = peak_fn(v)
                if p > peak:
                    peak = p
            rows.append(
                (prefix + aid, np.int32(rate), np.int32(n),
                 np.int64(n_clipped), np.int64((1_000_000 * n_clipped) // n),
                 np.int64(peak))
            )
    return pd.DataFrame(
        rows,
        columns=["item_id", "rate", "n_samples", "n_clipped", "clip_ppm",
                 "peak_abs"],
    ).astype({"rate": "int32", "n_samples": "int32", "n_clipped": "int64",
              "clip_ppm": "int64", "peak_abs": "int64"})


def expected_img_contentbox() -> pd.DataFrame:
    """Content-box twin over originals ('o:') and letterboxed variants
    ('l:').  The letterbox construction spec is shared (h64 parity →
    orientation, t = 4 + (h64>>4) % 9), built here with np.pad instead of
    the engine's canvas-assignment; the DETECTION is re-implemented as a
    per-row/column Python scan for any nonzero byte (engine: vectorized
    any() reductions + flatnonzero)."""
    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        h64 = xxh64(iid.encode())
        t = 4 + (h64 >> 4) % 9
        pad = ((t, t), (0, 0), (0, 0)) if h64 % 2 == 0 else ((0, 0), (t, t), (0, 0))
        boxed = np.pad(pix, pad)
        for prefix, p in (("o:", pix), ("l:", boxed)):
            h, w, _ = p.shape
            row_nz = [i for i in range(h) if any(int(v) != 0 for v in p[i].ravel())]
            col_nz = [j for j in range(w) if any(int(v) != 0 for v in p[:, j].ravel())]
            if not row_nz:
                top, left, cw, ch = 0, 0, 0, 0
            else:
                top, left = row_nz[0], col_nz[0]
                ch = row_nz[-1] - top + 1
                cw = col_nz[-1] - left + 1
            bar = (1000 * (h * w - ch * cw)) // (h * w)
            rows.append(
                (prefix + iid, np.int32(w), np.int32(h), np.int32(top),
                 np.int32(left), np.int32(cw), np.int32(ch), np.int64(bar))
            )
    return pd.DataFrame(
        rows,
        columns=["item_id", "w", "h", "crop_top", "crop_left", "crop_w",
                 "crop_h", "bar_permille"],
    ).astype({"w": "int32", "h": "int32", "crop_top": "int32",
              "crop_left": "int32", "crop_w": "int32", "crop_h": "int32",
              "bar_permille": "int64"})


def expected_audio_resample(gain_unused: int = 0) -> pd.DataFrame:
    """Resample twin: clip regeneration per the synthesize_audio spec; the
    2:1 box decimation and the Σ|x| / Σx² reductions re-implemented with a
    per-pair Python-int loop (engine: vectorized strided int64 numpy).
    Python // floors like numpy //, so negatives agree exactly."""
    rows = []
    for k in range(0, MAX_PARTKEY, 20):
        aid = f"aud{k}"
        h64 = xxh64(aid.encode())
        rate, n = 8000, 4000
        freq = 100.0 + (h64 % 1900)
        t = np.arange(n) / rate
        rng = np.random.default_rng(h64 & 0xFFFFFFFF)
        wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
        s = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        sum_abs, sum_sq, n_out = 0, 0, 0
        for i in range(0, n, 2):
            v = (int(s[i]) + int(s[i + 1])) // 2
            sum_abs += abs(v)
            sum_sq += v * v
            n_out += 1
        rows.append(
            (aid, np.int32(rate // 2), np.int32(n_out),
             np.int64(sum_abs), np.int64(sum_sq))
        )
    return pd.DataFrame(
        rows, columns=["audio_id", "rate_out", "n_out", "sum_abs", "sum_sq"]
    ).astype({"rate_out": "int32", "n_out": "int32",
              "sum_abs": "int64", "sum_sq": "int64"})


def expected_img_domcolor() -> pd.DataFrame:
    """Dominant-color twin: same shared make_image generator; the 64-bin
    quantized histogram is re-implemented as a per-pixel Python dict count
    with an explicit (-count, bin) tie-break (engine: vectorized
    np.bincount + argmax-first-max)."""
    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        counts: dict[int, int] = {}
        for row in pix.reshape(-1, 3):
            b = (int(row[0]) >> 6) * 16 + (int(row[1]) >> 6) * 4 + (int(row[2]) >> 6)
            counts[b] = counts.get(b, 0) + 1
        dom = min(sorted(counts), key=lambda b: (-counts[b], b))
        n = pix.shape[0] * pix.shape[1]
        rows.append(
            (iid, np.int32(dom), np.int64(counts[dom]), np.int64(n),
             np.int64((1_000_000 * counts[dom]) // n))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "dom_bin", "dom_count", "n_pixels", "share_ppm"],
    ).astype({"dom_bin": "int32", "dom_count": "int64", "n_pixels": "int64",
              "share_ppm": "int64"})


def expected_img_colorcast() -> pd.DataFrame:
    """Gray-world color-cast twin: same shared make_image generator; the
    channel sums are re-derived with np.add.reduceat row-block sums
    (engine: one reshape(-1, 3).sum(axis=0)); dominant is an explicit
    comparison chain (engine: np.argmax first-max); ratio/verdict restate
    the documented per-mille rule (multimodal.COLOR_CAST_PERMILLE)."""
    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        flat = pix.reshape(-1, 3).astype(np.int64)
        per_row = np.add.reduceat(flat, np.arange(0, flat.shape[0], 64), axis=0)
        sr, sg, sb = (int(v) for v in per_row.sum(axis=0))
        if sr >= sg and sr >= sb:
            dom = "r"
        elif sg >= sb:
            dom = "g"
        else:
            dom = "b"
        n = pix.shape[0] * pix.shape[1]
        ratio = 1000 * max(sr, sg, sb) // max(min(sr, sg, sb), 1)
        rows.append(
            (iid, np.int64(sr), np.int64(sg), np.int64(sb), np.int64(n),
             dom, np.int64(ratio), ratio > 1030)
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "sum_r", "sum_g", "sum_b", "n_px",
                 "dominant", "cast_ratio_permille", "cast"],
    ).astype({"sum_r": "int64", "sum_g": "int64", "sum_b": "int64",
              "n_px": "int64", "cast_ratio_permille": "int64"})


def expected_img_saliency() -> pd.DataFrame:
    """Saliency-crop twin: same shared make_image generator + xxh64 (the
    id/digest hash both sides consume); gradients re-derived with np.diff
    (engine: shifted-slice subtraction) and the centroid via flat-index
    divmod accumulation (engine: per-axis marginal sums)."""
    from rcspark.xxh import xxh64 as _xxh64

    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        h, w, _ = pix.shape
        g = pix.astype(np.int64).sum(axis=2)
        dx = np.abs(np.diff(g, axis=1))
        dy = np.abs(np.diff(g, axis=0))
        e = dx[: h - 1, :] + dy[:, : w - 1]
        tot = int(e.sum())
        if tot == 0:
            cx, cy = w // 2, h // 2
        else:
            flat = e.ravel()
            idx = np.arange(flat.size, dtype=np.int64)
            ys_i, xs_i = np.divmod(idx, w - 1)
            cx = int((flat * xs_i).sum()) // tot
            cy = int((flat * ys_i).sum()) // tot
        size = min(w, h)
        top = min(max(cy - size // 2, 0), h - size)
        left = min(max(cx - size // 2, 0), w - size)
        crop = pix[top : top + size, left : left + size]
        u = _xxh64(np.ascontiguousarray(crop).tobytes())
        rows.append(
            (iid, np.int64(cx), np.int64(cy), np.int64(top), np.int64(left),
             np.int64(size), np.int64(u - (1 << 64) if u >= (1 << 63) else u))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "cx", "cy", "crop_top", "crop_left",
                 "crop_size", "crop_digest"],
    ).astype({c: "int64" for c in
              ("cx", "cy", "crop_top", "crop_left", "crop_size", "crop_digest")})


def expected_img_palette() -> pd.DataFrame:
    """Median-cut palette twin: pure-Python lists/sorted() re-derivation of
    the written rules (engine: numpy lexsort/argmin) — longest-range
    channel with r>g>b ties, (channel, packed-rgb) pixel order,
    lower-median split, floor means, sorted packed palette, nearest-entry
    SSE with ties to the smaller packed value."""
    from rcspark.xxh import xxh64 as _xxh64

    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        pixels = [tuple(int(v) for v in p) for p in pix.reshape(-1, 3)]
        boxes = [pixels]
        for _ in range(4):
            nxt = []
            for b in boxes:
                packs = {(r << 16) | (g << 8) | bl for r, g, bl in b}
                if len(packs) <= 1:
                    nxt.append(b)
                    continue
                rngs = [max(p[c] for p in b) - min(p[c] for p in b)
                        for c in range(3)]
                ax = rngs.index(max(rngs))
                srt = sorted(b, key=lambda p: (p[ax],
                                               (p[0] << 16) | (p[1] << 8) | p[2]))
                half = len(srt) // 2
                nxt.append(srt[:half])
                nxt.append(srt[half:])
            boxes = nxt
        pal = sorted({
            ((sum(p[0] for p in b) // len(b)) << 16)
            | ((sum(p[1] for p in b) // len(b)) << 8)
            | (sum(p[2] for p in b) // len(b))
            for b in boxes
        })
        # SSE needs only the min distance (tie identity is irrelevant):
        # running np.minimum over palette entries (engine: one 3-D
        # broadcast + min(axis=1))
        flat = pix.reshape(-1, 3).astype(np.int64)
        best = None
        for p in pal:
            entry = np.array([(p >> 16) & 255, (p >> 8) & 255, p & 255],
                             dtype=np.int64)
            dd = ((flat - entry) ** 2).sum(axis=1)
            best = dd if best is None else np.minimum(best, dd)
        sse = int(best.sum())
        u = _xxh64(",".join(str(p) for p in pal).encode())
        rows.append((iid, np.int32(len(pal)),
                     np.int64(u - (1 << 64) if u >= (1 << 63) else u),
                     np.int64(sse)))
    return pd.DataFrame(
        rows, columns=["image_id", "n_colors", "palette_digest", "sse"],
    ).astype({"n_colors": "int32", "palette_digest": "int64", "sse": "int64"})


def expected_img_blocks() -> pd.DataFrame:
    """Shared-patch twin: same seed map + splitmix64 byte streams (shared
    construction, like make_image), but block EXTRACTION goes through one
    reshape(G, P, G, P, 3) + transpose instead of the engine's 2-D
    slicing loops; signatures are the same signed xxh64 over block bytes."""
    from rcspark.datapipe.multimodal import (
        PATCH_GRID as G,
        PATCH_PX as P,
        build_patch_image,
    )
    from rcspark.xxh import xxh64 as _xxh64

    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        img = build_patch_image(k)
        blocks = img.reshape(G, P, G, P, 3).transpose(0, 2, 1, 3, 4)
        for by in range(G):
            for bx in range(G):
                u = _xxh64(np.ascontiguousarray(blocks[by, bx]).tobytes())
                rows.append(
                    (f"img{k}", np.int32(bx), np.int32(by),
                     np.int64(u - (1 << 64) if u >= (1 << 63) else u))
                )
    return pd.DataFrame(
        rows, columns=["image_id", "bx", "by", "block_sig"],
    ).astype({"bx": "int32", "by": "int32", "block_sig": "int64"})


def expected_img_equalize() -> pd.DataFrame:
    """Equalization twin: same shared make_image generator; the histogram,
    CDF, and LUT application are re-implemented with Python-int dict
    counting and an explicit running-total loop (engine: bincount +
    cumsum + vectorized take)."""
    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        data, _, _, _, _ = make_image(iid)
        pix, _ = twin_decode_image(data)
        g = [int(r) + int(gg) + int(b) for r, gg, b in pix.reshape(-1, 3)]
        hist: dict[int, int] = {}
        for v in g:
            hist[v] = hist.get(v, 0) + 1
        levels = sorted(hist)
        n = len(g)
        cdf_min = hist[levels[0]]
        denom = n - cdf_min
        lut, run = {}, 0
        for v in levels:
            run += hist[v]
            lut[v] = ((run - cdf_min) * 765) // denom if denom else 0
        eq = [lut[v] for v in g]
        rows.append(
            (iid, np.int64(n), np.int32(levels[0]), np.int32(levels[-1]),
             np.int32(max(eq)), np.int64(sum(eq)))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "n_pixels", "lo_in", "hi_in", "hi_out", "eq_sum"],
    ).astype({"n_pixels": "int64", "lo_in": "int32", "hi_in": "int32",
              "hi_out": "int32", "eq_sum": "int64"})


def expected_img_jpeg(quality: int = 90) -> pd.DataFrame:
    """img_jpeg_roundtrip twin: the smooth image (shared generator) is
    encoded with the engine's deterministic baseline encoder — encoder
    bytes are DATA here, like make_image's container bytes — then decoded
    with the INDEPENDENT scalar spec-forward decoder (scripts/jpeg_twin.py)
    and reduced with scalar integer sums. The decode contract is exact
    fixed-point, so the twin's sse must equal the engine's bit-for-bit."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import encode_jpeg
    from scripts.jpeg_twin import twin_decode_jpeg

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        data = encode_jpeg(pix, quality=quality)
        dec = twin_decode_jpeg(data)
        h, w = len(dec), len(dec[0])
        sse = 0
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    d = dec[y][x][c] - int(pix[y, x, c])
                    sse += d * d
        npx = h * w * 3
        rows.append(
            (iid, np.int32(w), np.int32(h), np.int64(len(data)),
             np.int64(sse), bool(sse * 10_000 <= npx * 65_025))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "w", "h", "n_jpeg_bytes", "sse", "psnr40_ok"],
    ).astype({"w": "int32", "h": "int32", "n_jpeg_bytes": "int64", "sse": "int64"})


def expected_img_ssim(min_ppm: int = 990_000) -> pd.DataFrame:
    """img_ssim twin: the smooth image is encoded with the engine's
    encoder at the id-derived quality (bytes are DATA), decoded with the
    INDEPENDENT scalar decoder (scripts/jpeg_twin.py), and the
    exact-integer SSIM contract (multimodal.SSIM_SCHEMA comment block) is
    re-derived with SCALAR per-pixel luma and per-block sums — no numpy
    reductions — so a defect in either side's reduction breaks the hash."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import encode_jpeg
    from scripts.jpeg_twin import twin_decode_jpeg

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        q = 30 + ((xxh64(iid.encode()) >> 24) % 61)
        pix = make_smooth_image(iid)
        dec = twin_decode_jpeg(encode_jpeg(pix, quality=q))
        h, w = len(dec), len(dec[0])
        lx = [[(77 * int(pix[y, x, 0]) + 150 * int(pix[y, x, 1])
                + 29 * int(pix[y, x, 2])) // 256 for x in range(w)]
              for y in range(h)]
        ly = [[(77 * dec[y][x][0] + 150 * dec[y][x][1]
                + 29 * dec[y][x][2]) // 256 for x in range(w)]
              for y in range(h)]
        n, c1, c2, s = 64, 65025, 585225, 10_000
        total = 0
        nb = 0
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
                nb += 1
        ppm = total // nb
        rows.append(
            (iid, np.int32(w), np.int32(h), np.int32(q), np.int64(nb),
             np.int64(ppm), bool(ppm >= min_ppm))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "w", "h", "quality", "n_blocks", "ssim_ppm",
                 "ssim_ok"],
    ).astype({"w": "int32", "h": "int32", "quality": "int32",
              "n_blocks": "int64", "ssim_ppm": "int64"})


def expected_img_webp() -> pd.DataFrame:
    """img_webp_roundtrip twin: the smooth image (shared generator) is
    encoded with the engine's deterministic VP8L encoder — the bytes are
    DATA, like the jpeg twin — then decoded with the INDEPENDENT scalar
    spec-forward decoder (scripts/webp_twin.py) and compared pixel by
    pixel with scalar ints. Lossless contract: `exact` is computed, not
    assumed, so a defect in encoder or either decoder breaks the hash."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.webp import encode_webp_auto
    from scripts.webp_twin import twin_decode_webp

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        data, mode = encode_webp_auto(pix)
        dec = twin_decode_webp(data)
        h, w = len(dec), len(dec[0])
        exact = h == pix.shape[0] and w == pix.shape[1]
        for y in range(h):
            if not exact:
                break
            for x in range(w):
                px = dec[y][x]
                if (
                    px[0] != int(pix[y, x, 0])
                    or px[1] != int(pix[y, x, 1])
                    or px[2] != int(pix[y, x, 2])
                    or px[3] != 255
                ):
                    exact = False
                    break
        rows.append(
            (iid, np.int32(w), np.int32(h), np.int64(len(data)), mode, bool(exact))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "w", "h", "n_webp_bytes", "enc_mode", "exact"],
    ).astype({"w": "int32", "h": "int32", "n_webp_bytes": "int64"})


def expected_img_jpeg_quality(q_floor: int = 60) -> pd.DataFrame:
    """img_jpeg_quality twin: bytes from the shared generator chain
    (smooth image + deterministic encoder), then an INDEPENDENT scalar
    DQT readback — own marker walk, own zigzag placement, own IJG
    rescaling of the Annex-K base table (the base table itself is spec
    DATA, imported; the formula is re-implemented)."""
    import struct

    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import QUANT_LUM, ZIGZAG, encode_jpeg
    from rcspark.xxh import xxh64

    base = [int(x) for x in QUANT_LUM.reshape(64)]

    def scaled(q: int) -> list[int]:
        q = min(max(q, 1), 100)
        s = 5000 // q if q < 50 else 200 - 2 * q
        return [min(max((b * s + 50) // 100, 1), 255) for b in base]

    def read_lum_dqt(data: bytes) -> list[int]:
        i = 2
        while i < len(data) - 3:
            if data[i] != 0xFF:
                i += 1
                continue
            m = data[i + 1]
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            if m in (0xD9, 0xDA):
                break
            (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
            if m == 0xDB:
                seg = data[i + 4 : i + 2 + ln]
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    if tq == 0 and pq == 0:
                        nat = [0] * 64
                        for zi, pos in enumerate(ZIGZAG):
                            nat[pos] = seg[p + 1 + zi]
                        return nat
                    p += 1 + (128 if pq else 64)
            i += 2 + ln
        raise ValueError("twin: no luminance DQT")

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        true_q = 35 + xxh64(iid.encode()) % 61
        data = encode_jpeg(make_smooth_image(iid), quality=true_q)
        tbl = read_lum_dqt(data)
        best_q, best_d = -1, None
        for q in range(1, 101):
            cand = scaled(q)
            d = sum(abs(cand[j] - tbl[j]) for j in range(64))
            if best_d is None or d < best_d:
                best_q, best_d = q, d
            if d == 0:
                break
        rows.append(
            (iid, np.int32(true_q), np.int32(best_q), np.int64(best_d),
             bool(best_q >= q_floor))
        )
    return pd.DataFrame(
        rows, columns=["image_id", "true_q", "est_q", "dqt_dist", "keep"]
    ).astype({"true_q": "int32", "est_q": "int32", "dqt_dist": "int64"})


def expected_img_transcode(quality: int = 90) -> pd.DataFrame:
    """img_transcode_webp_jpeg twin: the WebP and JPEG bytes come from the
    engine's deterministic encoders (bytes are DATA, as in the jpeg/webp
    twins), but BOTH decode legs run the independent scalar decoders —
    scripts/webp_twin.py for the lossless ingest, scripts/jpeg_twin.py for
    the stored copy — and the fidelity sums are scalar ints vs the shared
    generator's original pixels. The JPEG is re-encoded from the TWIN's
    decoded WebP pixels, so a lossless-leg defect in either decoder
    changes the downstream bytes and breaks the hash."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import encode_jpeg
    from rcspark.webp import encode_webp_auto
    from scripts.jpeg_twin import twin_decode_jpeg
    from scripts.webp_twin import twin_decode_webp

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        wdata, _ = encode_webp_auto(pix)
        dec_w = twin_decode_webp(wdata)
        h, w = len(dec_w), len(dec_w[0])
        exact = h == pix.shape[0] and w == pix.shape[1]
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                px = dec_w[y][x]
                rgb[y, x] = px[:3]
                if exact and (
                    px[0] != int(pix[y, x, 0])
                    or px[1] != int(pix[y, x, 1])
                    or px[2] != int(pix[y, x, 2])
                    or px[3] != 255
                ):
                    exact = False
        jdata = encode_jpeg(rgb, quality=quality)
        dec_j = twin_decode_jpeg(jdata)
        sse = 0
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    d = dec_j[y][x][c] - int(pix[y, x, c])
                    sse += d * d
        npx = h * w * 3
        rows.append(
            (iid, np.int32(w), np.int32(h), np.int64(len(wdata)),
             np.int64(len(jdata)), bool(exact), np.int64(sse),
             bool(sse * 10_000 <= npx * 65_025))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "w", "h", "n_webp_bytes", "n_jpeg_bytes",
                 "webp_exact", "sse", "psnr40_ok"],
    ).astype({"w": "int32", "h": "int32", "n_webp_bytes": "int64",
              "n_jpeg_bytes": "int64", "sse": "int64"})


def expected_img_gif() -> pd.DataFrame:
    """img_gif_roundtrip twin: bytes from the engine's deterministic GIF
    encoder (bytes are DATA, like the jpeg/webp twins), decoded with the
    INDEPENDENT scalar scripts/gif_twin.py decoder (bit-by-bit LZW,
    dict-of-bytestrings) and compared pixel by pixel against the twin's
    OWN scalar 3-3-2 quantization formula (exact-palette rows compare
    against the raw pixels). `exact` is computed, never assumed."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.gif import encode_gif
    from scripts.gif_twin import twin_decode_gif, twin_quantize_332

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        data, mode = encode_gif(pix)
        dec = twin_decode_gif(data)
        h, w = len(dec), len(dec[0])
        exact = h == pix.shape[0] and w == pix.shape[1]
        for y in range(h):
            if not exact:
                break
            for x in range(w):
                r, g, b = (int(pix[y, x, 0]), int(pix[y, x, 1]), int(pix[y, x, 2]))
                want = (r, g, b) if mode == "exact" else twin_quantize_332(r, g, b)
                if tuple(dec[y][x]) != want:
                    exact = False
                    break
        rows.append(
            (iid, np.int32(w), np.int32(h), np.int64(len(data)), mode, bool(exact))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "w", "h", "n_gif_bytes", "pal_mode", "exact"],
    ).astype({"w": "int32", "h": "int32", "n_gif_bytes": "int64"})


def expected_img_transcode_gif(quality: int = 90) -> pd.DataFrame:
    """img_transcode_gif_jpeg twin: GIF and JPEG bytes from the engine's
    encoders; BOTH decode legs run the independent scalar decoders
    (scripts/gif_twin.py, scripts/jpeg_twin.py). The JPEG is re-encoded
    from the TWIN's decoded GIF pixels and fidelity sums are scalar ints
    vs those same decoded-GIF pixels (the ingested truth for a palette
    format) — so a palette/LZW defect in either decoder changes the
    downstream bytes AND the reference frame, breaking the hash."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.gif import encode_gif
    from rcspark.jpeg import encode_jpeg
    from scripts.gif_twin import twin_decode_gif, twin_quantize_332
    from scripts.jpeg_twin import twin_decode_jpeg

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        gdata, mode = encode_gif(pix)
        dec_g = twin_decode_gif(gdata)
        h, w = len(dec_g), len(dec_g[0])
        gif_exact = h == pix.shape[0] and w == pix.shape[1]
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                px = dec_g[y][x]
                rgb[y, x] = px
                if gif_exact:
                    r, g, b = (
                        int(pix[y, x, 0]), int(pix[y, x, 1]), int(pix[y, x, 2])
                    )
                    want = (
                        (r, g, b) if mode == "exact" else twin_quantize_332(r, g, b)
                    )
                    if tuple(px) != want:
                        gif_exact = False
        jdata = encode_jpeg(rgb, quality=quality)
        dec_j = twin_decode_jpeg(jdata)
        sse = 0
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    d = dec_j[y][x][c] - int(rgb[y, x, c])
                    sse += d * d
        npx = h * w * 3
        rows.append(
            (iid, np.int32(w), np.int32(h), np.int64(len(gdata)),
             np.int64(len(jdata)), mode, bool(gif_exact), np.int64(sse),
             bool(sse * 10_000 <= npx * 65_025))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "w", "h", "n_gif_bytes", "n_jpeg_bytes",
                 "pal_mode", "gif_exact", "sse", "psnr40_ok"],
    ).astype({"w": "int32", "h": "int32", "n_gif_bytes": "int64",
              "n_jpeg_bytes": "int64", "sse": "int64"})


def expected_img_gif_anim() -> pd.DataFrame:
    """img_gif_anim_frames twin: the shot-frame stack (shared generator)
    is encoded as one animated GIF by the engine; the twin re-decodes it
    frame by frame with its per-pixel compositor and computes scalar-int
    channel sums + its own quantization-contract comparison."""
    from rcspark.fixtures import make_shot_frames
    from rcspark.gif import encode_gif_frames
    from scripts.gif_twin import twin_decode_gif_frames, twin_quantize_332

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        frames = make_shot_frames(iid)
        flist = [np.ascontiguousarray(f) for f in frames]
        data, mode = encode_gif_frames(flist, delays_cs=[4] * len(flist))
        dec = twin_decode_gif_frames(data)
        for i, fr in enumerate(dec):
            src = flist[i]
            h, w = len(fr), len(fr[0])
            exact = h == src.shape[0] and w == src.shape[1]
            sr = sg = sb = 0
            for y in range(h):
                for x in range(w):
                    r, g, b = fr[y][x]
                    sr += r
                    sg += g
                    sb += b
                    if exact:
                        pr, pg, pb = (
                            int(src[y, x, 0]), int(src[y, x, 1]), int(src[y, x, 2])
                        )
                        want = (
                            (pr, pg, pb) if mode == "exact"
                            else twin_quantize_332(pr, pg, pb)
                        )
                        if (r, g, b) != want:
                            exact = False
            rows.append(
                (iid, np.int32(i), np.int32(len(dec)), np.int64(len(data)),
                 np.int64(sr), np.int64(sg), np.int64(sb), bool(exact))
            )
    return pd.DataFrame(
        rows,
        columns=["image_id", "frame_idx", "n_frames", "n_gif_bytes",
                 "sum_r", "sum_g", "sum_b", "exact"],
    ).astype({"frame_idx": "int32", "n_frames": "int32",
              "n_gif_bytes": "int64", "sum_r": "int64", "sum_g": "int64",
              "sum_b": "int64"})


def _twin_read_orientation(data: bytes) -> int:
    """Independent APP1/TIFF walk (struct.unpack_from based, both byte
    orders) — not the engine's int.from_bytes marker walk."""
    import struct as _s

    assert data[:2] == b"\xff\xd8"
    pos = 2
    while pos + 4 <= len(data) and data[pos] == 0xFF:
        marker, seg = _s.unpack_from(">BH", data, pos + 1)
        if marker in (0xDA, 0xD9):
            break
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            base = pos + 10
            fmt = {b"II": "<", b"MM": ">"}.get(data[base : base + 2])
            if fmt:
                (ifd_off,) = _s.unpack_from(fmt + "I", data, base + 4)
                (n,) = _s.unpack_from(fmt + "H", data, base + ifd_off)
                for e in range(n):
                    tag, typ, _cnt, val16, _pad = _s.unpack_from(
                        fmt + "HHIHH", data, base + ifd_off + 2 + 12 * e
                    )
                    if tag == 0x0112 and typ == 3:
                        return val16
        pos += 2 + seg
    return 1


def _twin_orient(px: list, o: int) -> list:
    """Per-pixel source-index mapping (the engine uses numpy slicing)."""
    h, w = len(px), len(px[0])
    if o in (1, 2, 3, 4):
        oh, ow = h, w
    else:
        oh, ow = w, h
    src = {
        1: lambda y, x: (y, x),
        2: lambda y, x: (y, w - 1 - x),
        3: lambda y, x: (h - 1 - y, w - 1 - x),
        4: lambda y, x: (h - 1 - y, x),
        5: lambda y, x: (x, y),
        6: lambda y, x: (h - 1 - x, y),
        7: lambda y, x: (h - 1 - x, w - 1 - y),
        8: lambda y, x: (x, w - 1 - y),
    }[o]
    out = []
    for y in range(oh):
        row = []
        for x in range(ow):
            sy, sx = src(y, x)
            row.append(px[sy][sx])
        out.append(row)
    return out


def expected_img_exif_orient() -> pd.DataFrame:
    """img_exif_autoorient twin: bytes from the engine encoder (planted
    orientation is DATA inside them), then an independent APP1 walk, the
    independent scalar JPEG decode, a per-pixel index-mapped re-orient,
    and the twin's reduceat phash."""
    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import encode_jpeg
    from scripts.jpeg_twin import twin_decode_jpeg

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        planted = 1 + xxh64(iid.encode()) % 8
        data = encode_jpeg(pix, quality=90, exif_orientation=planted)
        o = _twin_read_orientation(data)
        dec = twin_decode_jpeg(data)
        up = _twin_orient(dec, o)
        arr = np.array(
            [[list(c) for c in row] for row in up], dtype=np.uint8
        )
        rows.append(
            (iid, np.int32(o), np.int32(len(dec[0])), np.int32(len(dec)),
             np.int32(arr.shape[1]), np.int32(arr.shape[0]),
             np.int64(twin_phash(arr)))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "orientation", "stored_w", "stored_h",
                 "out_w", "out_h", "phash"],
    ).astype({"orientation": "int32", "stored_w": "int32",
              "stored_h": "int32", "out_w": "int32", "out_h": "int32",
              "phash": "int64"})


def expected_img_thumbs(quality: int = 85) -> pd.DataFrame:
    """img_thumbs_pipeline twin: its OWN aspect-fit formula, per-pixel
    scalar block means, then the engine's JPEG bytes decoded with the
    independent scripts/jpeg_twin.py decoder for the sums/sse."""
    from rcspark.datapipe.multimodal import THUMB_SIZES
    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import encode_jpeg
    from scripts.jpeg_twin import twin_decode_jpeg

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        h, w = pix.shape[:2]
        for name, tw, th in THUMB_SIZES:
            # own fit restatement: scale to the binding dimension
            if w * th <= h * tw:
                oh = th
                ow = (w * th) // h
                if ow < 1:
                    ow = 1
            else:
                ow = tw
                oh = (h * tw) // w
                if oh < 1:
                    oh = 1
            ys = [h * i // oh for i in range(oh + 1)]
            xs = [w * j // ow for j in range(ow + 1)]
            thumb = np.zeros((oh, ow, 3), dtype=np.uint8)
            for i in range(oh):
                for j in range(ow):
                    acc = [0, 0, 0]
                    n = 0
                    for y in range(ys[i], ys[i + 1]):
                        for x in range(xs[j], xs[j + 1]):
                            for c in range(3):
                                acc[c] += int(pix[y, x, c])
                            n += 1
                    for c in range(3):
                        thumb[i, j, c] = acc[c] // n
            data = encode_jpeg(thumb, quality=quality)
            dec = twin_decode_jpeg(data)
            sr = sg = sb = 0
            sse = 0
            for y in range(oh):
                for x in range(ow):
                    r, g, b = dec[y][x][0], dec[y][x][1], dec[y][x][2]
                    sr += r
                    sg += g
                    sb += b
                    for c, v in enumerate((r, g, b)):
                        d = v - int(thumb[y, x, c])
                        sse += d * d
            rows.append(
                (iid, name, np.int32(ow), np.int32(oh), np.int64(len(data)),
                 np.int64(sr), np.int64(sg), np.int64(sb), np.int64(sse))
            )
    return pd.DataFrame(
        rows,
        columns=["image_id", "thumb", "out_w", "out_h", "n_jpeg_bytes",
                 "sum_r", "sum_g", "sum_b", "sse"],
    ).astype({"out_w": "int32", "out_h": "int32", "n_jpeg_bytes": "int64",
              "sum_r": "int64", "sum_g": "int64", "sum_b": "int64",
              "sse": "int64"})


def expected_video_keyframes(threshold_permille: int = 150) -> pd.DataFrame:
    """video_keyframe_select twin: shared shot-frame generator, its own
    segmentation loop (per-channel Python-int MAD like the scene-cut
    twin) and a per-pixel scalar Laplacian accumulator (the engine uses
    one vectorized int64 slice expression)."""
    from rcspark.fixtures import make_shot_frames

    rows = []
    for k in range(5, MAX_PARTKEY, 20):
        vid = f"sv{k}"
        frames = make_shot_frames(vid).astype(np.int64)
        n, h, w, _ = frames.shape
        denom = h * w * 3 * 255
        bounds = [0]
        for i in range(1, n):
            mad = 0
            for c in range(3):
                mad += int(abs(frames[i, :, :, c] - frames[i - 1, :, :, c]).sum())
            if (1000 * mad) // denom >= threshold_permille:
                bounds.append(i)
        bounds.append(n)
        for s in range(len(bounds) - 1):
            a, b = bounds[s], bounds[s + 1]
            best_i, best_e = a, -1
            for i in range(a, b):
                lum = [[int(frames[i, y, x, 0] + frames[i, y, x, 1]
                            + frames[i, y, x, 2]) for x in range(w)]
                       for y in range(h)]
                e = 0
                for y in range(1, h - 1):
                    for x in range(1, w - 1):
                        lap = (4 * lum[y][x] - lum[y - 1][x] - lum[y + 1][x]
                               - lum[y][x - 1] - lum[y][x + 1])
                        e += lap * lap
                if e > best_e:
                    best_i, best_e = i, e
            rows.append((vid, np.int32(s), np.int32(a), np.int32(b - 1),
                         np.int32(best_i), np.int64(best_e)))
    return pd.DataFrame(
        rows,
        columns=["video_id", "shot_id", "start_idx", "end_idx",
                 "key_idx", "key_lap_energy"],
    ).astype({"shot_id": "int32", "start_idx": "int32", "end_idx": "int32",
              "key_idx": "int32", "key_lap_energy": "int64"})


def expected_img_bmp() -> pd.DataFrame:
    """img_bmp_roundtrip twin: bytes from the engine's deterministic BMP
    encoder (bytes are DATA, like every codec twin), re-decoded with the
    INDEPENDENT scalar scripts/bmp_twin.py walk and compared pixel by
    pixel with plain ints. The fixture crop (xxh64(id)%3 columns) is part
    of the shared generator so every 4-byte stride residue occurs."""
    from rcspark.bmp import encode_bmp
    from rcspark.datapipe.multimodal import _bmp_fixture_pixels
    from scripts.bmp_twin import twin_decode_bmp

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = _bmp_fixture_pixels(iid)
        data = encode_bmp(pix)
        dec = twin_decode_bmp(data)
        h, w = len(dec), len(dec[0])
        exact = h == pix.shape[0] and w == pix.shape[1]
        for y in range(h):
            if not exact:
                break
            for x in range(w):
                if tuple(int(v) for v in pix[y, x]) != dec[y][x]:
                    exact = False
                    break
        rows.append((iid, np.int32(w), np.int32(h), np.int64(len(data)), bool(exact)))
    return pd.DataFrame(
        rows, columns=["image_id", "w", "h", "n_bmp_bytes", "exact"]
    ).astype({"w": "int32", "h": "int32", "n_bmp_bytes": "int64"})


def expected_img_transcode_bmp(quality: int = 90) -> pd.DataFrame:
    """img_transcode_bmp_jpeg twin: BMP and JPEG bytes from the engine's
    encoders (DATA), both decode legs re-run with the independent scalar
    decoders (scripts/bmp_twin.py + scripts/jpeg_twin.py), sse/psnr40
    restated with scalar integer arithmetic against the original pixels."""
    from rcspark.bmp import encode_bmp
    from rcspark.datapipe.multimodal import _bmp_fixture_pixels
    from rcspark.jpeg import encode_jpeg
    from scripts.bmp_twin import twin_decode_bmp
    from scripts.jpeg_twin import twin_decode_jpeg

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = _bmp_fixture_pixels(iid)
        bdata = encode_bmp(pix)
        dec_b = twin_decode_bmp(bdata)
        h, w = len(dec_b), len(dec_b[0])
        bmp_exact = h == pix.shape[0] and w == pix.shape[1]
        for y in range(h):
            if not bmp_exact:
                break
            for x in range(w):
                if tuple(int(v) for v in pix[y, x]) != dec_b[y][x]:
                    bmp_exact = False
                    break
        arr = np.array(dec_b, dtype=np.uint8)
        jdata = encode_jpeg(arr, quality=quality)
        dec_j = twin_decode_jpeg(jdata)
        sse = 0
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    d = int(dec_j[y][x][c]) - int(pix[y, x, c])
                    sse += d * d
        npx = h * w * 3
        rows.append(
            (iid, np.int32(w), np.int32(h), np.int64(len(bdata)),
             np.int64(len(jdata)), bool(bmp_exact), np.int64(sse),
             bool(sse * 10_000 <= npx * 65_025))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "w", "h", "n_bmp_bytes", "n_jpeg_bytes",
                 "bmp_exact", "sse", "psnr40_ok"],
    ).astype({"w": "int32", "h": "int32", "n_bmp_bytes": "int64",
              "n_jpeg_bytes": "int64", "sse": "int64"})


def expected_img_tile_phash() -> pd.DataFrame:
    """img_tile_phash twin: original + watermarked pixels from the shared
    generators (make_smooth_image / make_watermarked — DATA), quadrant
    split + perceptual hash + hamming re-derived with the INDEPENDENT
    twin_phash (reduceat block sums) and scalar popcounts."""
    from rcspark.fixtures import make_smooth_image, make_watermarked

    def qhashes(pix):
        h, w = pix.shape[:2]
        hh, hw = h // 2, w // 2
        return [
            twin_phash(pix[:hh, :hw]), twin_phash(pix[:hh, hw:]),
            twin_phash(pix[hh:, :hw]), twin_phash(pix[hh:, hw:]),
        ]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        base, var = make_smooth_image(iid), make_watermarked(iid)
        qh = [ham(a, b) for a, b in zip(qhashes(base), qhashes(var))]
        gh = ham(twin_phash(base), twin_phash(var))
        nm = sum(1 for x in qh if x <= 6)
        rows.append(
            (iid, np.int64(qh[0]), np.int64(qh[1]), np.int64(qh[2]),
             np.int64(qh[3]), np.int64(nm), np.int64(gh), bool(nm >= 3),
             bool(gh <= 6))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "qham0", "qham1", "qham2", "qham3",
                 "n_quad_match", "global_hamming", "tile_dup", "global_dup"],
    ).astype({c: "int64" for c in
              ["qham0", "qham1", "qham2", "qham3", "n_quad_match",
               "global_hamming"]})



def expected_img_exif_scrub() -> pd.DataFrame:
    """img_exif_gps_scrub twin: the planted JPEG (engine encoder +
    plant_exif) is DATA; the SCRUB is re-derived independently — own
    marker walk, own IFD0 scan, own minimal orientation-only APP1 writer
    from the pinned layout — so a defect in scrub_exif_metadata breaks the
    md5 even though the input bytes are shared."""
    import hashlib
    import struct as st

    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import encode_jpeg, plant_exif

    def twin_scrub(data: bytes):
        # independent scalar walk (no rcspark.jpeg reuse past this point)
        assert data[:2] == b"\xff\xd8"
        i = 2
        span = None
        while i + 4 <= len(data) and data[i] == 0xFF:
            while i + 1 < len(data) and data[i + 1] == 0xFF:
                i += 1
            m = data[i + 1]
            if m in (0xDA, 0xD9):
                break
            if m == 0x01 or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            end = i + 2 + st.unpack(">H", data[i + 2:i + 4])[0]
            if m == 0xE1 and data[i + 4:i + 10] == b"Exif\x00\x00":
                span = (i, end)
                break
            i = end
        if span is None:
            return data, False, 1
        a, b = span
        t = a + 10
        order = data[t:t + 2]
        lil = order == b"II"
        def rd(o, n):
            raw = data[o:o + n]
            return int.from_bytes(raw, "little" if lil else "big")
        had_gps, orient = False, None
        ifd = t + rd(t + 4, 4)
        cnt = rd(ifd, 2)
        for e in range(cnt):
            q = ifd + 2 + 12 * e
            tag, typ = rd(q, 2), rd(q + 2, 2)
            if tag == 0x0112 and typ == 3 and 1 <= rd(q + 8, 2) <= 8:
                orient = rd(q + 8, 2)
            elif tag == 0x8825:
                had_gps = True
        if orient is None:
            repl = b""
        else:
            tiff = (b"II*\x00" + st.pack("<I", 8) + st.pack("<H", 1)
                    + st.pack("<HHIHH", 0x0112, 3, 1, orient, 0)
                    + st.pack("<I", 0))
            payload = b"Exif\x00\x00" + tiff
            repl = b"\xff\xe1" + st.pack(">H", len(payload) + 2) + payload
        return data[:a] + repl + data[b:], had_gps, orient or 1

    rows = []
    for k in range(0, MAX_PARTKEY, 30):
        iid = f"img{k}"
        hv = xxh64(iid.encode())
        o = 1 + ((hv >> 16) % 8)
        gps = (None if (hv >> 8) % 3 == 0 else
               (((hv >> 13) % 180_000_000) - 90_000_000,
                ((hv >> 17) % 360_000_000) - 180_000_000))
        planted = plant_exif(encode_jpeg(make_smooth_image(iid), quality=80),
                             o, gps)
        clean, had_gps, o_read = twin_scrub(planted)
        assert o_read == o
        rows.append((iid, np.int32(o), bool(had_gps),
                     np.int64(len(planted)), np.int64(len(clean)),
                     hashlib.md5(clean).hexdigest()))
    return pd.DataFrame(
        rows, columns=["image_id", "orientation", "had_gps", "n_before",
                       "n_after", "clean_md5"],
    ).astype({"orientation": "int32", "n_before": "int64",
              "n_after": "int64"})


def expected_img_quarantine() -> pd.DataFrame:
    """img_media_quarantine twin: the arrival CLASS is the construction
    ground truth (rcspark.fixtures.make_mixed_arrival builds each class),
    so the twin derives (fmt_sniffed, decode_ok, reason) from the class
    directly — independent of the engine's sniff/route code — and checks
    dims against the shared generator. It also re-sniffs the actual bytes
    with its OWN magic walk to catch a generator/class mismatch."""
    from rcspark.fixtures import _ARRIVAL_CLASSES, make_mixed_arrival, make_smooth_image

    def twin_sniff(data: bytes) -> str:
        if data[:8] == bytes([0x89]) + b"PNG\r\n" + bytes([0x1A]) + b"\n":
            return "png"
        if data[:2] == b"\xff\xd8":
            return "jpeg"
        if data[:3] == b"GIF":
            return "gif"
        if data[:2] == b"BM":
            return "bmp"
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            return {
                b"VP8L": "webp_vp8l", b"VP8 ": "webp_vp8", b"VP8X": "webp_vp8x",
            }.get(data[12:16], "webp_unknown")
        return "unknown"

    # class -> (fmt_sniffed, decode_ok, reason)
    truth = {
        "png": ("png", True, None),
        "jpeg": ("jpeg", True, None),
        "gif": ("gif", True, None),
        "bmp": ("bmp", True, None),
        "webp_vp8l": ("webp_vp8l", True, None),
        "webp_vp8": ("webp_vp8", False, "unsupported_codec"),
        "webp_vp8x": ("webp_vp8x", False, "unsupported_codec"),
        "trunc_png": ("png", False, "corrupt"),
        "garbage": ("unknown", False, "unknown_format"),
    }
    rows = []
    for k in range(0, MAX_PARTKEY, 25):
        iid = f"img{k}"
        cls = (k // 25) % len(_ARRIVAL_CLASSES)
        kind = _ARRIVAL_CLASSES[cls]
        data = make_mixed_arrival(iid, cls)
        fmt, ok, reason = truth[kind]
        assert twin_sniff(data) == fmt, (iid, kind, twin_sniff(data))
        if ok:
            ph, pw = make_smooth_image(iid).shape[:2]
            rows.append((iid, fmt, True, None, np.int32(pw), np.int32(ph)))
        else:
            rows.append((iid, fmt, False, reason, None, None))
    return pd.DataFrame(
        rows,
        columns=["image_id", "fmt_sniffed", "decode_ok", "quarantine_reason",
                 "w", "h"],
    ).astype({"w": "Int32", "h": "Int32"})


def expected_img_header() -> pd.DataFrame:
    """img_header_probe twin: an INDEPENDENT struct.unpack-based header
    parser over the same mixed arrivals (the engine reader uses
    int.from_bytes slices). Classes with decodable frames also cross-check
    the parsed dims against the shared generator's ground truth; the
    lossy/extended WebP stubs and garbage pin (fmt, NULL, NULL); the
    truncated PNG must still yield IHDR dims."""
    import struct as _s

    from rcspark.fixtures import _ARRIVAL_CLASSES, make_mixed_arrival, make_smooth_image

    def twin_parse(data: bytes) -> tuple[str, "int | None", "int | None"]:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            if len(data) >= 24 and data[12:16] == b"IHDR":
                w, h = _s.unpack_from(">II", data, 16)
                return "png", int(w), int(h)
            return "png", None, None
        if data[:2] == b"\xff\xd8":
            pos = 2
            while pos + 9 <= len(data) and data[pos] == 0xFF:
                marker = data[pos + 1]
                if marker in (0xC0, 0xC1, 0xC2):
                    _, h, w = _s.unpack_from(">BHH", data, pos + 4)
                    return "jpeg", int(w), int(h)
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                (seg,) = _s.unpack_from(">H", data, pos + 2)
                if seg < 2:
                    break
                pos += 2 + seg
            return "jpeg", None, None
        if data[:3] == b"GIF":
            w, h = _s.unpack_from("<HH", data, 6)
            return "gif", int(w), int(h)
        if data[:2] == b"BM":
            w, h = _s.unpack_from("<ii", data, 18)
            return "bmp", abs(int(w)), abs(int(h))
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            four = data[12:16]
            if four == b"VP8L" and len(data) >= 25 and data[20] == 0x2F:
                (b,) = _s.unpack_from("<I", data, 21)
                return "webp_vp8l", (b & 0x3FFF) + 1, ((b >> 14) & 0x3FFF) + 1
            return {
                b"VP8L": "webp_vp8l", b"VP8 ": "webp_vp8", b"VP8X": "webp_vp8x",
            }.get(four, "webp_unknown"), None, None
        return "unknown", None, None

    rows = []
    for k in range(0, MAX_PARTKEY, 25):
        iid = f"img{k}"
        cls = (k // 25) % len(_ARRIVAL_CLASSES)
        kind = _ARRIVAL_CLASSES[cls]
        fmt, w, h = twin_parse(make_mixed_arrival(iid, cls))
        if kind in ("png", "jpeg", "gif", "bmp", "webp_vp8l", "trunc_png"):
            ph, pw = make_smooth_image(iid).shape[:2]
            assert (w, h) == (pw, ph), (iid, kind, w, h, pw, ph)
        else:
            assert w is None and h is None, (iid, kind, w, h)
        rows.append((iid, fmt, w, h, w is not None))
    return pd.DataFrame(
        rows,
        columns=["image_id", "probe_fmt", "probe_w", "probe_h",
                 "dims_available"],
    ).astype({"probe_w": "Int32", "probe_h": "Int32"})


def expected_img_bomb() -> pd.DataFrame:
    """img_bomb_gate twin: rebuild each arrival, independently parse the
    DECLARED IHDR dims with struct.unpack, and re-derive the verdict from
    the same published limits; class truth asserted per kind."""
    import struct as _s

    from rcspark.fixtures import BOMB_CLASSES, make_bomb_arrival

    rows = []
    for k in range(0, MAX_PARTKEY, 25):
        iid = f"img{k}"
        cls = (k // 25) % len(BOMB_CLASSES)
        kind = BOMB_CLASSES[cls]
        data = make_bomb_arrival(iid, cls)
        assert data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR"
        w, h = _s.unpack_from(">II", data, 16)
        px = int(w) * int(h)
        if px > 50_000_000:
            reason = "too_many_pixels"
        elif px * 3 > 1000 * len(data):
            reason = "suspicious_ratio"
        else:
            reason = None
        assert reason == {"normal": None, "pixel_bomb": "too_many_pixels",
                          "ratio_bomb": "suspicious_ratio"}[kind], (iid, kind)
        rows.append((iid, len(data), int(w), int(h), px, reason,
                     reason is None))
    return pd.DataFrame(
        rows,
        columns=["image_id", "nbytes", "w", "h", "pixels", "flag_reason",
                 "admitted"],
    ).astype({"w": "Int32", "h": "Int32"})


def expected_img_dihedral() -> pd.DataFrame:
    """img_phash_dihedral twin: transforms re-implemented as explicit
    index-mapping fancy indexing (NOT np.rot90/fliplr) and hashes via
    twin_phash; asserts the invariance law — a planted transform's
    dihedral key equals its original's."""
    from rcspark.fixtures import make_smooth_image

    def xform(pix: np.ndarray, kind: str) -> np.ndarray:
        h, w = pix.shape[:2]
        ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        if kind == "id":
            return pix
        if kind == "rot90":  # np.rot90 k=1: out[i,j] = in[j, w_out-1-i]... derive by size
            oi, oj = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
            return pix[oj, w - 1 - oi]
        if kind == "rot180":
            return pix[h - 1 - ii, w - 1 - jj]
        if kind == "rot270":
            oi, oj = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
            return pix[h - 1 - oj, oi]
        if kind == "fliplr":
            return pix[ii, w - 1 - jj]
        if kind == "flipud":
            return pix[h - 1 - ii, jj]
        raise ValueError(kind)

    def key(pix: np.ndarray) -> int:
        vals = []
        for base in ("id", "rot90", "rot180", "rot270"):
            p = xform(pix, base)
            vals.append(twin_phash(p))
            vals.append(twin_phash(xform(p, "fliplr")))
        return min(vals)

    plants = ("rot90", "rot180", "rot270", "fliplr", "flipud")
    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        k0 = key(pix)
        rows.append((iid, "o:" + iid, twin_phash(pix), k0))
        if k % 20 == 0:
            kind = plants[(k // 20) % 5]
            q = xform(pix, kind)
            kq = key(q)
            assert kq == k0, (iid, kind, kq, k0)  # the invariance law
            rows.append((iid, "r:" + iid, twin_phash(q), kq))
    return pd.DataFrame(
        rows, columns=["image_id", "item_id", "phash_plain", "dihedral_key"]
    )


def expected_video_clips(clip_len: int = 8, stride: int = 4,
                         max_frames: int = 24) -> pd.DataFrame:
    """video_clip_windows twin: window arithmetic re-derived directly and
    the representative (middle-frame) phash via twin_phash over the
    id-seeded generator frames."""
    rows = []
    for k in range(0, MAX_PARTKEY, 20):
        vid = f"vid{k}"
        h64 = xxh64(vid.encode())
        n = 4 + h64 % (max_frames - 3)
        if n < clip_len:
            continue
        rng = np.random.default_rng(h64 & 0xFFFFFFFF)
        frames = rng.integers(0, 256, (n, 16, 16, 3), dtype=np.uint8)
        n_clips = (n - clip_len) // stride + 1
        for c in range(n_clips):
            s = c * stride
            rows.append(
                (vid, np.int32(c), np.int32(s), np.int32(s + clip_len),
                 np.int32(n), np.int32(n_clips),
                 np.int64(twin_phash(frames[s + clip_len // 2]))))
    return pd.DataFrame(
        rows,
        columns=["video_id", "clip_idx", "start_frame", "end_frame",
                 "n_frames", "n_clips", "rep_phash"],
    ).astype({"clip_idx": "int32", "start_frame": "int32",
              "end_frame": "int32", "n_frames": "int32", "n_clips": "int32",
              "rep_phash": "int64"})


def _twin_read_thumbnail(data: bytes) -> tuple[bytes | None, int]:
    """Independent APP1/IFD0→IFD1 walk (struct.unpack_from based) for the
    embedded-thumbnail span — not the engine's int.from_bytes reader."""
    import struct as _s

    assert data[:2] == b"\xff\xd8"
    pos = 2
    while pos + 4 <= len(data) and data[pos] == 0xFF:
        marker, seg = _s.unpack_from(">BH", data, pos + 1)
        if marker in (0xDA, 0xD9):
            break
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            base, seg_end = pos + 10, pos + 2 + seg
            fmt = {b"II": "<", b"MM": ">"}.get(data[base : base + 2])
            if not fmt:
                return None, 1
            (ifd_off,) = _s.unpack_from(fmt + "I", data, base + 4)
            (n,) = _s.unpack_from(fmt + "H", data, base + ifd_off)
            orientation = 1
            for e in range(n):
                tag, typ, _cnt, val16, _pad = _s.unpack_from(
                    fmt + "HHIHH", data, base + ifd_off + 2 + 12 * e
                )
                if tag == 0x0112 and typ == 3:
                    orientation = val16
            (nxt,) = _s.unpack_from(fmt + "I", data, base + ifd_off + 2 + 12 * n)
            if nxt == 0:
                return None, orientation
            (n1,) = _s.unpack_from(fmt + "H", data, base + nxt)
            off = ln = None
            for e in range(n1):
                tag, typ, _cnt, val32 = _s.unpack_from(
                    fmt + "HHII", data, base + nxt + 2 + 12 * e
                )
                if tag == 0x0201 and typ == 4:
                    off = val32
                elif tag == 0x0202 and typ == 4:
                    ln = val32
            if off is None or ln is None:
                return None, orientation
            assert base + off + ln <= seg_end
            return bytes(data[base + off : base + off + ln]), orientation
        pos += 2 + seg
    return None, 1


def expected_img_exif_thumb(max_side: int = 12, quality: int = 85) -> pd.DataFrame:
    """img_exif_thumbnail twin: bytes from the engine encoder + planter
    (the planted thumbnail is DATA inside them, like exif_orient); then an
    INDEPENDENT IFD0→IFD1 walk, the independent scalar JPEG decode for the
    sums, its own scalar fit restatement asserted against the extracted
    dims, and an independent scrub rebuild (drop the APP1 found by its own
    walk, splice its own minimal orientation-only APP1) re-walked to prove
    the thumbnail is gone."""
    import struct as _s

    from rcspark.fixtures import make_smooth_image
    from rcspark.jpeg import encode_jpeg, plant_exif_thumbnail
    from rcspark.datapipe.multimodal import fit_box, int_block_mean
    from scripts.jpeg_twin import twin_decode_jpeg

    rows = []
    for k in range(0, MAX_PARTKEY, 40):
        iid = f"img{k}"
        pix = make_smooth_image(iid)
        h, w = pix.shape[0], pix.shape[1]
        planted_o = 1 + xxh64(iid.encode()) % 8
        tw, th = fit_box(w, h, max_side, max_side)
        tb = encode_jpeg(int_block_mean(pix, th, tw), quality=quality)
        data = plant_exif_thumbnail(encode_jpeg(pix, quality=90), planted_o, tb)
        etb, o = _twin_read_thumbnail(data)
        dec = twin_decode_jpeg(etb)
        # independent fit restatement must agree with the extracted dims
        if w * max_side <= h * max_side:
            exp_w, exp_h = max(1, (w * max_side) // h), max_side
        else:
            exp_w, exp_h = max_side, max(1, (h * max_side) // w)
        assert (len(dec[0]), len(dec)) == (exp_w, exp_h)
        sr = sum(c[0] for row in dec for c in row)
        sg = sum(c[1] for row in dec for c in row)
        sb = sum(c[2] for row in dec for c in row)
        # independent scrub: cut the APP1 (own walk), splice own minimal
        # orientation-only APP1, re-walk
        pos = 2
        while data[pos] == 0xFF:
            marker, seg = _s.unpack_from(">BH", data, pos + 1)
            if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
                break
            pos += 2 + seg
        mini = (b"Exif\x00\x00II*\x00" + _s.pack("<I", 8) + _s.pack("<H", 1)
                + _s.pack("<HHIHH", 0x0112, 3, 1, o, 0) + _s.pack("<I", 0))
        scrubbed = (data[:pos] + b"\xff\xe1" + _s.pack(">H", len(mini) + 2)
                    + mini + data[pos + 2 + seg :])
        rows.append(
            (iid, np.int32(o), np.int32(len(dec[0])), np.int32(len(dec)),
             np.int64(len(etb)), np.int64(sr), np.int64(sg), np.int64(sb),
             _twin_read_thumbnail(scrubbed)[0] is None)
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "orientation", "thumb_w", "thumb_h",
                 "n_thumb_bytes", "sum_r", "sum_g", "sum_b",
                 "scrub_strips_thumb"],
    ).astype({"orientation": "int32", "thumb_w": "int32", "thumb_h": "int32",
              "n_thumb_bytes": "int64", "sum_r": "int64", "sum_g": "int64",
              "sum_b": "int64"})


def expected_img_skin() -> pd.DataFrame:
    """img_pair_safety_gate twin (image side): same shared generator and
    documented skin-blend plant; the MASK is re-derived with a different
    formulation (per-pixel sorted channels for max/min, count_nonzero over
    a reordered condition chain — engine: maximum/minimum elementwise +
    mask.sum)."""
    from rcspark.fixtures import make_smooth_image

    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        iid = f"img{k}"
        pix = make_smooth_image(iid).astype(np.int64)
        planted = xxh64(f"{iid}:skin".encode()) % 3 == 0
        if planted:
            pix = (pix + 2 * np.array([205, 140, 110])) // 3
        flat = pix.reshape(-1, 3)
        s = np.sort(flat, axis=1)
        r, g, b = flat[:, 0], flat[:, 1], flat[:, 2]
        cond = (
            (s[:, 2] - s[:, 0] > 15)
            & (r > 95) & (r > g) & (r > b)
            & (g > 40) & (b > 20)
            & ((r - g > 15) | (g - r > 15))
        )
        n = flat.shape[0]
        skin = int(np.count_nonzero(cond))
        ppm = 1_000_000 * skin // n
        rows.append(
            (iid, bool(planted), np.int64(n), np.int64(skin), np.int64(ppm),
             ppm > 400_000)
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "planted", "n_px", "skin_px", "skin_ppm",
                 "skin_flag"],
    ).astype({"n_px": "int64", "skin_px": "int64", "skin_ppm": "int64"})


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "media_expected")
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in [
        ("img_features", expected_img_features),
        ("img_reencode", expected_img_reencode),
        ("video_frames", expected_video_frames),
        ("video_scenecut", expected_scene_cuts),
        ("audio_features", expected_audio_features),
        ("img_patchify", expected_img_patchify),
        ("audio_vad", expected_audio_vad),
        ("img_sharpness", expected_img_sharpness),
        ("audio_clipping", expected_audio_clipping),
        ("img_contentbox", expected_img_contentbox),
        ("audio_resample", expected_audio_resample),
        ("img_domcolor", expected_img_domcolor),
        ("img_colorcast", expected_img_colorcast),
        ("img_saliency", expected_img_saliency),
        ("img_palette", expected_img_palette),
        ("img_blocks", expected_img_blocks),
        ("img_equalize", expected_img_equalize),
        ("img_jpeg", expected_img_jpeg),
        ("img_jpeg_quality", expected_img_jpeg_quality),
        ("img_webp", expected_img_webp),
        ("img_transcode", expected_img_transcode),
        ("img_gif", expected_img_gif),
        ("img_transcode_gif", expected_img_transcode_gif),
        ("img_gif_anim", expected_img_gif_anim),
        ("img_exif_orient", expected_img_exif_orient),
        ("img_thumbs", expected_img_thumbs),
        ("video_keyframes", expected_video_keyframes),
        ("img_bmp", expected_img_bmp),
        ("img_transcode_bmp", expected_img_transcode_bmp),
        ("img_tile_phash", expected_img_tile_phash),
        ("img_ssim", expected_img_ssim),
        ("img_exif_scrub", expected_img_exif_scrub),
        ("img_quarantine", expected_img_quarantine),
        ("img_exif_thumb", expected_img_exif_thumb),
        ("img_skin", expected_img_skin),
        ("img_header", expected_img_header),
        ("img_bomb", expected_img_bomb),
        ("img_dihedral", expected_img_dihedral),
        ("video_clips", expected_video_clips),
        ("wav_features", expected_wav_features),
        ("img_textdensity", expected_img_textdensity),
        ("img_bicubic", expected_img_bicubic),
        ("audio_bands", expected_audio_bands),
    ]:
        # optional name filter: gen_media_expected.py [out_dir] [name ...]
        if len(sys.argv) > 2 and name not in sys.argv[2:]:
            continue
        pdf = fn()
        path = os.path.join(out_dir, f"{name}.parquet")
        pdf.to_parquet(path, index=False)
        print(f"{path}: {len(pdf)} rows")


if __name__ == "__main__":
    main()
