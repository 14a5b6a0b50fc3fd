"""Semantic property of the round-5 batch-75 operator:

- doc_ngram_novelty: counts re-derived in pure Python over the same
  3-gram shingle rule; the self-novelty law — a wave compared against
  ITSELF has novelty 0, and against an empty base 1e6.
"""

from __future__ import annotations

import re

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch75")


def _shingles(text):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    } if len(toks) >= 3 else set()


def test_novelty_python_twin(spark):
    import duckdb

    a, b = set(), set()
    for did, t in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall():
        (a if did % 2 == 0 else b).update(_shingles(t))
    r = QUERIES["doc_ngram_novelty"](spark, SF_DIR).collect()[0]
    assert (r.n_base, r.n_wave) == (len(a), len(b))
    assert r.n_novel == len(b - a)
    assert r.novelty_ppm == 1_000_000 * len(b - a) // len(b)
    assert 0 < r.novelty_ppm < 1_000_000  # the halves share SOME shingles
