"""Semantic properties of the round-5 batch-41 operators — the media
privacy/safety plane:

- rcspark.jpeg IFD1 machinery: plant → extract roundtrip byte-exact,
  orientation carried in IFD0, scrub strips the thumbnail, hostile
  declared spans raise instead of mis-slicing.
- img_exif_thumbnail: dims bounded by max_side, never upscaled.
- skin gate: planted skin-blend images score higher than their own
  unplanted base; flag law at the ppm threshold.
- img_pair_safety_gate: first-failing precedence (caption before image),
  the planted ' xrated' suffix is caught by tokenization, keep law.
"""

from __future__ import annotations

import numpy as np
import pytest

from rcspark.fixtures import make_smooth_image
from rcspark.jpeg import (
    decode_jpeg,
    encode_jpeg,
    plant_exif_thumbnail,
    read_exif_thumbnail,
    scrub_exif_metadata,
)
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch41")


def test_ifd1_plant_extract_roundtrip():
    pix = make_smooth_image("img0")
    tb = encode_jpeg(pix[::4, ::4], quality=85)
    main = encode_jpeg(pix, quality=90)
    data = plant_exif_thumbnail(main, 6, tb)
    etb, o = read_exif_thumbnail(data)
    assert etb == tb and o == 6
    # idempotent: replanting replaces, not duplicates
    data2 = plant_exif_thumbnail(data, 3, tb)
    etb2, o2 = read_exif_thumbnail(data2)
    assert etb2 == tb and o2 == 3
    # absent -> (None, 1)
    assert read_exif_thumbnail(main) == (None, 1)
    # the whitelist scrub strips IFD1 but keeps orientation
    scrubbed, _, orient = scrub_exif_metadata(data)
    assert read_exif_thumbnail(scrubbed) == (None, 6) and orient == 6


def test_ifd1_hostile_span_raises():
    pix = make_smooth_image("img0")
    tb = encode_jpeg(pix[::4, ::4], quality=85)
    data = bytearray(plant_exif_thumbnail(encode_jpeg(pix), 1, tb))
    # corrupt the IFD1 JPEGInterchangeFormatLength (offset 56 span) to
    # claim bytes past the APP1 segment end
    idx = data.find(b"Exif\x00\x00") + 6  # TIFF base
    # IFD1 entry 2 value u32 sits at tiff+26+2+12+8
    pos = idx + 26 + 2 + 12 + 8
    data[pos : pos + 4] = (2**31).to_bytes(4, "little")
    with pytest.raises(ValueError):
        read_exif_thumbnail(bytes(data))


def test_exif_thumbnail_query_bounds(spark):
    rows = QUERIES["img_exif_thumbnail"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.orientation <= 8
        assert 1 <= r.thumb_w <= 12 and 1 <= r.thumb_h <= 12
        assert max(r.thumb_w, r.thumb_h) == 12  # aspect-fit touches the box
        assert r.n_thumb_bytes > 0
        assert r.scrub_strips_thumb
        assert r.sum_r + r.sum_g + r.sum_b > 0


def test_skin_gate_planted_scores_higher(spark):
    from rcspark.datapipe.multimodal import SKIN_TARGET, skin_gate
    from rcspark.xxh import xxh64

    df = QUERIES["img_pair_safety_gate"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    # third formulation of the rule, per-pixel Python, on one image each way
    def ref_ppm(iid: str) -> int:
        pix = make_smooth_image(iid).astype(np.int64)
        if xxh64(f"{iid}:skin".encode()) % 3 == 0:
            pix = (pix + 2 * np.array(SKIN_TARGET)) // 3
        n = skin = 0
        for row in pix.reshape(-1, 3).tolist():
            r, g, b = row
            n += 1
            if (r > 95 and g > 40 and b > 20 and max(row) - min(row) > 15
                    and abs(r - g) > 15 and r > g and r > b):
                skin += 1
        return 1_000_000 * skin // n

    for r in rows[:3]:
        assert r.skin_ppm == ref_ppm(r.image_id)
        assert r.skin_flag == (r.skin_ppm > 400_000)
    # the heuristic may flag warm-toned UNPLANTED images too (that is the
    # nature of a cheap skin rule) — the pinned law is that the planted
    # skin-blends flag at a strictly higher RATE than the base images
    planted = [r for r in rows
               if xxh64(f"{r.image_id}:skin".encode()) % 3 == 0]
    base = [r for r in rows
            if xxh64(f"{r.image_id}:skin".encode()) % 3 != 0]
    assert planted and base
    rate = lambda rs: sum(r.skin_flag for r in rs) / len(rs)  # noqa: E731
    assert rate(planted) > rate(base)


def test_pair_safety_gate_precedence(spark):
    rows = QUERIES["img_pair_safety_gate"](spark, SF_DIR).collect()
    seen = set()
    for r in rows:
        k = int(r.image_id[3:])
        # only the planted ' xrated' suffix trips the SAFETY list ('photo'
        # et al. are stop-captions, not safety terms)
        assert r.caption_blocked == (k % 17 == 0)
        seen.add(r.verdict)
    assert {"clean"} < seen


def test_pair_safety_gate_keep_law(spark):
    rows = QUERIES["img_pair_safety_gate"](spark, SF_DIR).collect()
    for r in rows:
        if r.caption_blocked:
            assert r.verdict == "caption_blocked"
        elif r.skin_flag:
            assert r.verdict == "image_flagged"
        else:
            assert r.verdict == "clean"
        assert r.keep == (not r.caption_blocked and not r.skin_flag)
