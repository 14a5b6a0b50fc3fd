"""Semantic properties of the round-4 batch-30 operators: saliency-crop
geometry on planted energy distributions, and sentence segmentation's
abbreviation protection + lossless reassembly."""

import numpy as np
import pytest

from rcspark.codecs import encode_ppm
from rcspark.datapipe.multimodal import saliency_crop
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch30")


def test_saliency_crop_geometry(spark):
    flat = np.full((16, 32, 3), 80, dtype=np.uint8)
    corner = flat.copy()
    corner[12:, 24:] = 250  # busy bottom-right block
    df = spark.createDataFrame(
        [("flat", encode_ppm(flat)), ("corner", encode_ppm(corner))],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in saliency_crop(df).collect()}
    f = out["flat"]
    # zero energy → geometric-center fallback
    assert (f.cx, f.cy) == (16, 8) and f.crop_size == 16
    assert f.crop_top == 0 and f.crop_left == 16 - 8
    c = out["corner"]
    # the centroid must chase the busy corner and stay in bounds
    assert c.cx > f.cx and c.cy >= f.cy
    assert 0 <= c.crop_left <= 32 - 16 and 0 <= c.crop_top <= 16 - 16
    assert c.crop_left > f.crop_left
    assert c.crop_digest != f.crop_digest


def test_nofollow_gate_meta_regexp_below_generate(spark):
    """Perf regression pin (bench-found, 89 s → 4.6 s at sf0.1): the
    page-level robots-meta regexp must be evaluated once per PAGE (a
    Project below the Generate), never re-run over the half-MB body per
    exploded anchor row."""
    df = QUERIES["crawl_nofollow_gate"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    gen_seen = False
    for ln in plan.splitlines():
        if "Generate" in ln:
            gen_seen = True
        if "robots" in ln and not gen_seen:
            pytest.fail(f"meta regexp above Generate:\n{plan}")
    assert gen_seen


def test_sentence_split_protection_and_reassembly(spark):
    rows = QUERIES["doc_sentence_split"](spark, SF_DIR).collect()
    cust = {
        r.o_orderkey: r.o_custkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_custkey").collect()
    }
    by_doc = {}
    for r in rows:
        assert r.n_chars == len(r.sentence)
        by_doc.setdefault(r.o_orderkey, []).append(r)
    assert by_doc
    for k, sents in by_doc.items():
        sents.sort(key=lambda r: r.sent_idx)
        assert [s.sent_idx for s in sents] == list(range(1, len(sents) + 1))
        assert len(sents) == (4 if k % 2 == 0 else 3)
        # abbreviation traps survive inside their sentences
        assert sents[0].sentence.startswith("Dr. Alpha")
        assert sents[0].sentence.endswith(".example.")
        assert sents[0].has_abbrev
        assert sents[1].sentence.endswith("units!")
        assert not sents[1].has_abbrev
        assert sents[2].sentence.endswith("cheap?")
        if k % 2 == 0:
            assert sents[3].sentence == "Mr. Beta approved, etc. done."
            assert sents[3].has_abbrev
        # lossless reassembly: sentences joined by one space == original
        rebuilt = " ".join(s.sentence for s in sents)
        assert rebuilt == (
            f"Dr. Alpha logged part {k} at h{cust[k] % 50}.example. "
            f"It cost {k % 97} units! Was batch {k % 13} cheap?"
            + (" Mr. Beta approved, etc. done." if k % 2 == 0 else "")
        )
