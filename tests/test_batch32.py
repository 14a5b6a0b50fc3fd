"""Semantic properties of the round-4 batch-32 operators: engine edit
distances verified against an independent Python DP, candidate-set equality
with the LSH tier, and the frontier-aging laws."""

import pytest

from rcspark.queries import _AGING_K, _AGING_NOW, _EDIT_NEARDUP_DEN, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch32")


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs(spark):
    rows = QUERIES["doc_edit_distance_pairs"](spark, SF_DIR).collect()
    assert rows, "planted near-dups must yield candidates"
    lsh = {(r.doc_a, r.doc_b) for r in QUERIES["doc_lsh_pairs"](spark, SF_DIR).collect()}
    assert {(r.doc_a, r.doc_b) for r in rows} == lsh
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text").collect()
    }
    assert any(r.is_neardup for r in rows)
    for r in rows:
        assert r.max_len == max(len(texts[r.doc_a]), len(texts[r.doc_b]))
        assert r.sim_permille == 1000 * (r.max_len - r.lev) // r.max_len
        assert r.is_neardup == (r.lev <= r.max_len // _EDIT_NEARDUP_DEN)
        # lev is BANDED: saturates at k + 1 (VERDICT r4 item 1)
        assert r.lev <= r.max_len // _EDIT_NEARDUP_DEN + 1
    # independent DP verification (banded) on the 10 closest pairs
    for r in sorted(rows, key=lambda r: r.lev)[:10]:
        k = r.max_len // _EDIT_NEARDUP_DEN
        assert r.lev == min(_lev(texts[r.doc_a], texts[r.doc_b]), k + 1)


def test_priority_aging_laws(spark):
    rows = QUERIES["crawl_priority_aging"](spark, SF_DIR).collect()
    assert rows
    assert any(r.promoted for r in rows) and any(not r.promoted for r in rows)
    for r in rows:
        assert 1 <= r.age_waves <= _AGING_NOW
        assert r.boost == r.age_waves // _AGING_K
        assert r.eff_priority == max(r.base_priority - r.boost, 0)
        assert r.promoted == (r.boost > 0 and r.base_priority > 0)
        assert 0 <= r.eff_priority <= r.base_priority
