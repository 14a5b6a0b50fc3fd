"""Semantic properties of the round-5 batch-59 operators:

- img_text_density: every 'tx:' plant trips the meme gate, every plain
  smooth item stays under it, and the text-row count of a plant matches
  the band-stamping law (every other 3-row group in the middle half).
- doc_watermark_detect: all 'wm:' green-biased plants are flagged, real
  documents are not (null hypothesis), the z≥4 integer identity matches
  a float z-score recomputation, and the vocabulary actually contains
  both green and non-green words (the rejection sampler is exercised).
"""

from __future__ import annotations

import math

import pytest

from rcspark.datapipe.hashing import digest60_py
from rcspark.queries import _WM_VOCAB, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch59")


def test_text_density_gate(spark):
    rows = QUERIES["img_text_density"](spark, SF_DIR).collect()
    plants = [r for r in rows if r.item_id.startswith("tx:")]
    plain = [r for r in rows if r.item_id.startswith("p:")]
    assert plants and plain
    for r in plants:
        assert r.is_text_heavy, r
        # band law: stamped rows are ((y - h/4) // 3) % 2 == 0 in [h/4, 3h/4)
        y0, y1 = r.h // 4, 3 * r.h // 4
        stamped = sum(1 for y in range(y0, y1) if ((y - y0) // 3) % 2 == 0)
        assert r.n_text_rows >= stamped  # every stamped row detected
        assert r.text_ppm == 1_000_000 * r.n_text_rows // r.h
    for r in plain:
        assert not r.is_text_heavy, r


def test_watermark_plants_flagged_reals_not(spark):
    greens = [t for t in _WM_VOCAB if digest60_py("wmg:" + t) % 2 == 0]
    assert 0 < len(greens) < len(_WM_VOCAB)
    rows = QUERIES["doc_watermark_detect"](spark, SF_DIR).collect()
    wm = [r for r in rows if r.doc_id.startswith("wm:")]
    real = [r for r in rows if not r.doc_id.startswith("wm:")]
    assert wm and real
    for r in wm:
        assert r.n_tokens == 64
        assert r.watermarked, r
    flagged_real = [r for r in real if r.watermarked]
    assert not flagged_real, flagged_real[:3]
    # integer identity == float z-test at threshold 4
    for r in rows:
        if r.n_tokens == 0:
            continue
        z = (r.n_green - r.n_tokens / 2) / math.sqrt(r.n_tokens / 4)
        assert r.watermarked == (z >= 4.0), (r, z)
