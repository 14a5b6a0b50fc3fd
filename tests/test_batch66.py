"""Semantic properties of the round-5 batch-66 operators:

- doc_hyphenation_repair: matches_expected is TRUE on every row (the
  regex repair equals direct construction), n_breaks follows the wrap
  law, and a handcrafted compound check: the repair leaves real hyphens
  ('state-of-the-art') alone while joining letter--newline breaks.
- doc_minhash_bbit: the 2-bit corrected estimate tracks the full-hash
  estimate (de-bias works), is never further from it than the raw
  collision rate is, and the raw b-bit collision count is always >= the
  full-hash agreement count (low bits can only add collisions).
"""

from __future__ import annotations

import re

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch66")


def test_hyphenation_repair(spark):
    import duckdb

    rows = QUERIES["doc_hyphenation_repair"](spark, SF_DIR).collect()
    assert rows
    toks = {
        d: len(re.findall(r"[a-z0-9]+", t.lower()))
        for d, t in duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    }
    for r in rows:
        assert r.matches_expected, r.doc_id
        assert r.n_breaks == (toks[r.doc_id] - 1) // 7
    # the repair regex itself: joins breaks, leaves compounds
    fixed = re.sub(r"([a-z0-9])-\n([a-z0-9])", r"\1\2", "state-of-the-art exam-\nple")
    assert fixed == "state-of-the-art example"


def test_bbit_debias_tracks_full_estimate(spark):
    rows = QUERIES["doc_minhash_bbit"](spark, SF_DIR).collect()
    assert rows
    err_corr = err_raw = 0
    for r in rows:
        assert 0 <= r.n_eq_full <= 16 and 0 <= r.n_eq_b2 <= 16
        assert r.n_eq_b2 >= r.n_eq_full  # low bits only add collisions
        assert r.j_full_ppm == 1_000_000 * r.n_eq_full // 16
        assert r.j_bbit_ppm == max((4 * r.n_eq_b2 - 16) * 1_000_000 // 48, 0)
        raw_c_ppm = 1_000_000 * r.n_eq_b2 // 16
        err_corr += abs(r.j_bbit_ppm - r.j_full_ppm)
        err_raw += abs(raw_c_ppm - r.j_full_ppm)
    # the de-bias is the point: corrected has far lower aggregate error
    # than the raw collision rate (which is biased up by (1-J)/4)
    assert err_corr < 0.5 * err_raw
