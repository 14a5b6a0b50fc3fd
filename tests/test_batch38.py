"""Semantic properties of the round-5 batch-38 quarantine plane: routing
taxonomy (never raise), class coverage, dims-vs-generator equality, and the
native-codec seam preference order (monkeypatched fake PIL)."""

import numpy as np
import pytest

from rcspark.datapipe import multimodal as mm
from rcspark.fixtures import _ARRIVAL_CLASSES, make_mixed_arrival, make_smooth_image
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"  # smallest sf covering all 9 classes


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch38")


def test_decode_or_quarantine_never_raises():
    for cls, kind in enumerate(_ARRIVAL_CLASSES):
        data = make_mixed_arrival(f"img{cls}q", cls)
        pix, fmt, reason = mm.decode_or_quarantine(data)
        if kind in ("png", "jpeg", "gif", "bmp", "webp_vp8l"):
            assert reason is None and pix is not None
            assert pix.shape[:2] == make_smooth_image(f"img{cls}q").shape[:2]
        elif kind in ("webp_vp8", "webp_vp8x"):
            assert reason == "unsupported_codec" and pix is None
            assert fmt == kind
        elif kind == "trunc_png":
            assert reason == "corrupt" and fmt == "png" and pix is None
        else:
            assert reason == "unknown_format" and fmt == "unknown"


def test_sniff_format_magic():
    assert mm.sniff_format(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert mm.sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert mm.sniff_format(b"GIF89a") == "gif"
    assert mm.sniff_format(b"BMxxxx") == "bmp"
    assert mm.sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8L") == "webp_vp8l"
    assert mm.sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp_vp8"
    assert mm.sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8X") == "webp_vp8x"
    assert mm.sniff_format(b"\x00\x01junk") == "unknown"
    assert mm.sniff_format(b"") == "unknown"


def test_native_seam_preferred(monkeypatch):
    """When a native decode succeeds, its pixels win over the pure-Python
    path (the real-cluster hot path); when it returns None, the fallback
    still decodes. Monkeypatch stands in for an installed PIL."""
    sentinel = np.zeros((4, 7, 3), dtype=np.uint8)
    calls = []

    def fake_native(data):
        calls.append(len(data))
        return sentinel

    monkeypatch.setattr(mm, "native_decode", fake_native)
    data = make_mixed_arrival("imgseam", 0)  # a real PNG arrival
    pix, fmt, reason = mm.decode_or_quarantine(data)
    assert reason is None and fmt == "png"
    assert pix.shape == (4, 7, 3) and calls  # the native result was used

    monkeypatch.setattr(mm, "native_decode", lambda data: None)
    pix2, _, reason2 = mm.decode_or_quarantine(data)
    assert reason2 is None
    assert pix2.shape[:2] == make_smooth_image("imgseam").shape[:2]


from hypothesis import given, settings
from hypothesis import strategies as st

_MAGICS = [
    b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"GIF87a", b"BM",
    b"RIFF\x10\x00\x00\x00WEBPVP8L", b"RIFF\x10\x00\x00\x00WEBPVP8 ",
    b"P6\n", b"Q6\n",
]


@settings(max_examples=200, deadline=None)
@given(prefix=st.sampled_from(_MAGICS), tail=st.binary(max_size=96))
def test_quarantine_route_never_raises_fuzz(prefix, tail):
    """Arbitrary bytes behind any (or no) known magic must ROUTE —
    decode_or_quarantine is the mid-wave path, one hostile blob must
    never raise (VERDICT r4 item 2)."""
    pix, fmt, reason = mm.decode_or_quarantine(prefix + tail)
    assert (pix is None) == (reason is not None)
    if reason is not None:
        assert reason in ("unsupported_codec", "corrupt", "unknown_format")


@settings(max_examples=60, deadline=None)
@given(cut=st.integers(min_value=1, max_value=200), cls=st.integers(0, 4))
def test_quarantine_truncation_fuzz(cut, cls):
    """Every prefix of a REAL decodable arrival either still decodes
    (some suffixes are padding) or routes 'corrupt'/'unknown_format' —
    never an exception, never 'unsupported_codec' mislabeling."""
    data = make_mixed_arrival("imgfz", cls)
    chopped = data[: max(1, len(data) - cut)]
    pix, fmt, reason = mm.decode_or_quarantine(chopped)
    assert reason in (None, "corrupt", "unknown_format")


def test_native_decode_absent_here():
    # the sandbox has no PIL: the seam must report None, never raise
    assert mm.native_decode(b"\x89PNG\r\n\x1a\n") is None


def test_quarantine_query_routing(spark):
    rows = QUERIES["img_media_quarantine"](spark, SF_DIR).collect()
    assert len(rows) == 80
    reasons = {r.quarantine_reason for r in rows}
    assert reasons == {None, "unsupported_codec", "corrupt", "unknown_format"}
    for r in rows:
        assert r.decode_ok == (r.quarantine_reason is None)
        if r.decode_ok:
            ph, pw = make_smooth_image(r.image_id).shape[:2]
            assert (r.w, r.h) == (pw, ph)
        else:
            assert r.w is None and r.h is None
    # counted quarantine: every class routes, nothing is silently dropped
    k_ids = {int(r.image_id[3:]) for r in rows}
    assert k_ids == set(range(0, 2000, 25))
