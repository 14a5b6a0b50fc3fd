"""Semantic properties of the round-4 batch-31 operators: median-cut
palette exactness on planted color layouts, and retrieval-metric laws plus
cross-operator consistency with the hard-negative miner."""

import numpy as np
import pytest

from rcspark.codecs import encode_ppm
from rcspark.datapipe.multimodal import palette_quantize_stats
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch31")


def test_median_cut_planted_layouts(spark):
    solid = np.full((8, 8, 3), 77, dtype=np.uint8)
    halves = solid.copy()
    halves[:, 4:] = (200, 10, 30)  # exact half/half two-color split
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(256, dtype=np.uint8).reshape(16, 16)
    df = spark.createDataFrame(
        [("solid", encode_ppm(solid)), ("halves", encode_ppm(halves)),
         ("grad", encode_ppm(grad))],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in palette_quantize_stats(df).collect()}
    assert out["solid"].n_colors == 1 and out["solid"].sse == 0
    # a 50/50 two-color image splits exactly at the median → lossless
    assert out["halves"].n_colors == 2 and out["halves"].sse == 0
    # 256 distinct reds cannot be losslessly represented by 16 entries
    assert out["grad"].n_colors == 16 and out["grad"].sse > 0
    assert len({r.palette_digest for r in out.values()}) == 3


def test_retrieval_mrr_laws_and_miner_consistency(spark):
    rows = {r.img_id: r for r in QUERIES["emb_retrieval_mrr"](spark, SF_DIR).collect()}
    assert rows
    for r in rows.values():
        assert r.rank is not None and 1 <= r.rank <= r.n_cands
        assert r.rr_ppm == 1_000_000 // r.rank
        assert r.hit1 == (r.rank == 1) and r.hit5 == (r.rank <= 5)
    mined = {
        r.img_id: r
        for r in QUERIES["emb_hard_negative_mine"](spark, SF_DIR).collect()
        if r.mined
    }
    assert mined
    for img_id, m in mined.items():
        r = rows[img_id]
        # a strictly-harder negative in the same bucket must push the
        # positive below rank 1; rank 1 implies no strictly-harder one
        if m.hard_neg_sim > m.true_sim:
            assert r.rank >= 2, (img_id, m, r)
        if r.rank == 1:
            assert m.hard_neg_sim <= m.true_sim, (img_id, m, r)
