"""Semantic properties of the round-5 batch-71 operators:

- emb_gate_threshold_sweep: keep-rate is monotone non-increasing in the
  threshold, counts re-derived from the pair cosines, and the curve
  actually discriminates (not flat 0 or 1 across the grid).
- stream_jsonld_captions: row-identical to the batch query (the fourth
  streaming==batch twin; the registered oracle is byte-identical too).
"""

from __future__ import annotations

import pytest

from rcspark.queries import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch71")


def test_threshold_sweep_monotone(spark):
    rows = sorted(
        QUERIES["emb_gate_threshold_sweep"](spark, SF_DIR).collect(),
        key=lambda r: r.thresh_cpm,
    )
    assert [r.thresh_cpm for r in rows] == [100 * i for i in range(1, 10)]
    n = rows[0].n_pairs
    keeps = [r.n_keep for r in rows]
    for r in rows:
        assert r.n_pairs == n
        assert r.keep_ppm == 1_000_000 * r.n_keep // n
    assert keeps == sorted(keeps, reverse=True)  # monotone
    assert keeps[0] > keeps[-1]  # the curve discriminates


def test_stream_twin_row_identical(spark):
    assert ORACLE["stream_jsonld_captions"] == ORACLE["crawl_jsonld_captions"]
    batch = {
        tuple(r) for r in QUERIES["crawl_jsonld_captions"](spark, SF_DIR).collect()
    }
    stream = {
        tuple(r) for r in QUERIES["stream_jsonld_captions"](spark, SF_DIR).collect()
    }
    assert batch == stream and batch
