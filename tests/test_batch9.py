"""Semantic properties of the round-3 batch-9 operators — invariants the
rows+schema+hash oracles can't state: α-temperature upweighting direction,
PMI support/order laws, int8 quantization error bounds, conditional-GET
status partitioning, and the planted sharp/blurred separation."""

import pytest

from rcspark.queries import _SHARP_THRESH, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch9")


def test_mixture_weights_temper_the_head(spark):
    rows = QUERIES["doc_mixture_weights"](spark, SF_DIR).collect()
    assert sum(r.sample_permille for r in rows) <= 1000
    # α=0.5 upweights small domains: sampling rate per doc must be
    # non-increasing in domain size
    by_size = sorted(rows, key=lambda r: r.n_docs)
    rates = [r.sample_permille / r.n_docs for r in by_size]
    assert all(a >= b - 1e-12 for a, b in zip(rates, rates[1:]))
    for r in rows:
        assert r.alpha_w * r.alpha_w <= r.n_docs < (r.alpha_w + 1) ** 2


def test_pmi_support_and_order(spark):
    rows = QUERIES["doc_pmi_collocations"](spark, SF_DIR).collect()
    assert rows, "corpus must yield collocations"
    assert all(r.c_xy >= 3 and r.score_ppm > 0 for r in rows)
    ranked = sorted(rows, key=lambda r: r.rnk)
    assert [r.rnk for r in ranked] == list(range(1, len(ranked) + 1))
    scores = [r.score_ppm for r in ranked]
    assert scores == sorted(scores, reverse=True)
    # a true collocation lifts above independence: the top hit must beat
    # the 1e6-ppm independence baseline
    assert scores[0] > 1_000_000


def test_int8_quant_error_bounds(spark):
    rows = QUERIES["emb_int8_quant"](spark, SF_DIR).collect()
    for r in rows:
        assert r.scale >= 0
        assert abs(r.code_sum) <= 127 * r.n_dims
        # half-away rounding: |127·q − code·scale| ≤ (scale+1)/2 per dim
        assert r.err_sum <= r.n_dims * (r.scale + 1) // 2 + r.n_dims


def test_conditional_get_status_partition(spark):
    rows = QUERIES["crawl_conditional_get"](spark, SF_DIR).collect()
    statuses = {r.status for r in rows}
    assert statuses <= {"miss", "fresh", "revalidate_304", "revalidate_200"}
    assert {"miss", "revalidate_304", "revalidate_200"} <= statuses
    for r in rows:
        if r.status == "miss":
            assert r.fetched_wave is None and r.etag_cached is None
        else:
            assert r.etag_cached is not None
        assert (r.bytes_saved > 0) == (r.status == "revalidate_304")
        if r.status == "revalidate_304":
            assert r.etag_cached == r.etag_current
        if r.status == "revalidate_200":
            assert r.etag_cached != r.etag_current


def test_sharpness_separates_planted_blur(spark):
    rows = QUERIES["img_sharpness"](spark, SF_DIR).collect()
    orig = [r for r in rows if r.item_id.startswith("o:")]
    blur = [r for r in rows if r.item_id.startswith("b:")]
    assert orig and len(orig) == len(blur)
    assert all(r.is_sharp for r in orig)
    assert not any(r.is_sharp for r in blur)
    # the gap is structural, not threshold-tuned: every original clears
    # the threshold by 2x, every blur sits at least 2x under it
    assert min(r.lap_meansq for r in orig) > 2 * _SHARP_THRESH
    assert max(r.lap_meansq for r in blur) < _SHARP_THRESH // 2
