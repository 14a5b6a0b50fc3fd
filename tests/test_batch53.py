"""Semantic properties of the round-5 batch-53 operators:

- doc_fim_splits: the PSM transform is LOSSLESS — prefix‖middle‖suffix
  reassembles the exact original for every FIM'd doc; all three spans
  are non-empty; the apply rate is the digest coin; passthrough docs are
  byte-identical.
- doc_script_ratio: each planted class's dominant script is its own;
  ppm columns are exact div-half-away of counts over length; latin text
  has zero Cyrillic/CJK/Arabic ppm.
"""

from __future__ import annotations

import hashlib

import pytest

from rcspark.queries import _FIM_MID, _FIM_PRE, _FIM_SUF, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch53")


def _d60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_fim_lossless_and_coin(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    texts = dict(zip(t["doc_id"], t["text"]))
    rows = QUERIES["doc_fim_splits"](spark, SF_DIR).collect()
    assert len(rows) == len(texts)
    n_fim = 0
    for r in rows:
        orig = texts[r.doc_id]
        assert r.apply_fim == (_d60(f"fimr:{r.doc_id}") % 2 == 0)
        assert 1 <= r.p1 < r.p2 <= len(orig) - 1
        if r.apply_fim:
            n_fim += 1
            assert r.out_text.startswith(_FIM_PRE)
            rest = r.out_text[len(_FIM_PRE):]
            prefix, rest = rest.split(_FIM_SUF, 1)
            suffix, middle = rest.split(_FIM_MID, 1)
            assert prefix + middle + suffix == orig  # lossless
            assert prefix and middle and suffix
            assert (len(prefix), len(prefix) + len(middle)) == (r.p1, r.p2)
        else:
            assert r.out_text == orig
    # the digest coin lands near half
    assert 0.35 < n_fim / len(rows) < 0.65


def test_script_ratio_classes(spark):
    rows = QUERIES["doc_script_ratio"](spark, SF_DIR).collect()
    expect = {0: "latin", 1: "cyrillic", 2: "cjk", 3: "arabic"}
    for r in rows:
        cls = r.doc_id % 4
        assert r.dominant_script == expect[cls], r
        if cls == 0:
            assert r.cyrillic_ppm == r.cjk_ppm == r.arabic_ppm == 0
            assert r.latin_ppm > 0
        for v in (r.latin_ppm, r.cyrillic_ppm, r.cjk_ppm, r.arabic_ppm):
            assert 0 <= v <= 1_000_000
