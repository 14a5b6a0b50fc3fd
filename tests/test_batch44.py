"""Batch-44 pins: ExactSubstr cut-range semantics on a PLANTED corpus
(exact island boundaries, adjacency merge, one-token-hole split) plus
structural laws on the real testdata.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from rcspark.queries import QUERIES, _CUT_W

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch44")


def _mkcorpus(tmp_path, docs: dict[int, str]) -> str:
    d = os.path.join(str(tmp_path), "corpus")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[k] for k in docs]}
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


def tok(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_exact_boundaries(spark, tmp_path):
    shared = tok("dup", 20)  # 20-token duplicated run (>= W=16)
    docs = {
        1: tok("a", 5) + " " + shared + " " + tok("b", 7),
        2: tok("c", 11) + " " + shared,
        3: tok("u", 40),  # unique — must emit nothing
    }
    d = _mkcorpus(tmp_path, docs)
    rows = QUERIES["doc_exact_substring_cut"](spark, d).collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append(r)
    assert 3 not in by
    (r1,) = by[1]
    # doc 1: shared run occupies tokens 6..25 (1-based)
    assert (r1.start_tok, r1.end_tok, r1.island_len) == (6, 25, 20)
    assert r1.n_doc_tokens == 32
    assert r1.cut_ppm == 1_000_000 * 20 // 32
    (r2,) = by[2]
    assert (r2.start_tok, r2.end_tok, r2.island_len) == (12, 31, 20)


def test_planted_hole_splits_islands(spark, tmp_path):
    s1, s2 = tok("x", _CUT_W), tok("y", _CUT_W)
    docs = {
        1: s1 + " hole1 " + s2,
        2: s1 + " hole2 " + s2,
    }
    d = _mkcorpus(tmp_path, docs)
    rows = QUERIES["doc_exact_substring_cut"](spark, d).collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append((r.start_tok, r.end_tok))
    # the one-token hole is NOT shared context: two separate islands,
    # each exactly one window long
    for doc in (1, 2):
        spans = sorted(by[doc])
        assert spans == [(1, _CUT_W), (_CUT_W + 2, 2 * _CUT_W + 1)], spans


def test_planted_adjacent_runs_merge(spark, tmp_path):
    # a 2W-token shared run must come back as ONE island, not two
    shared = tok("m", 2 * _CUT_W)
    docs = {1: shared, 2: tok("z", 3) + " " + shared}
    d = _mkcorpus(tmp_path, docs)
    rows = QUERIES["doc_exact_substring_cut"](spark, d).collect()
    one = [r for r in rows if r.doc_id == 1]
    assert len(one) == 1
    assert (one[0].start_tok, one[0].end_tok) == (1, 2 * _CUT_W)


def test_real_corpus_island_laws(spark):
    rows = QUERIES["doc_exact_substring_cut"](spark, SF_DIR).collect()
    assert rows
    by = {}
    for r in rows:
        assert r.island_len >= _CUT_W
        assert 1 <= r.start_tok <= r.end_tok <= r.n_doc_tokens
        assert r.island_len == r.end_tok - r.start_tok + 1
        assert r.cut_ppm == 1_000_000 * r.island_len // r.n_doc_tokens
        by.setdefault(r.doc_id, []).append(r)
    for doc, rs in by.items():
        rs.sort(key=lambda r: r.start_tok)
        for a, b in zip(rs, rs[1:]):
            # maximality: distinct islands are separated by a real hole
            assert b.start_tok > a.end_tok + 1, (doc, a, b)
