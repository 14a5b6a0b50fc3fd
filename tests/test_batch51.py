"""Semantic properties of the round-5 batch-51 operator:

- doc_perceptron_train: the engine's final margins equal an independent
  pure-Python integer trainer exactly (features, averaged update,
  div-half-away); the planted classes are linearly separated — training
  accuracy 1.0 (measured at all three scales during design; pinned here
  at sf0.001); margins have the right sign structure.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from rcspark.queries import (
    _PERC_DIM,
    _PERC_ITERS,
    _PERC_SALT_NEG,
    _PERC_SALT_POS,
    QUERIES,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch51")


def _d60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _dha(s: int, n: int) -> int:
    return (2 * s + n) // (2 * n) if s >= 0 else -((2 * (-s) + n) // (2 * n))


def _feats(text: str) -> list[int]:
    s = " " + re.sub("[^a-z0-9]+", " ", text.lower()) + " "
    x = [0] * _PERC_DIM
    for i in range(len(s) - 2):
        x[_d60("pf:" + s[i:i + 3]) % _PERC_DIM] += 1
    return x


def test_perceptron_matches_python_twin_and_separates(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    X, Y, ids = [], [], []
    for k, text in zip(t["doc_id"], t["text"]):
        y = 1 if k % 2 == 0 else -1
        salt = (_PERC_SALT_POS if y == 1 else _PERC_SALT_NEG) * 5
        X.append(_feats(text + salt))
        Y.append(y)
        ids.append(k)
    w = [0] * _PERC_DIM
    for _ in range(_PERC_ITERS):
        upd = [0] * _PERC_DIM
        miss = 0
        for x, y in zip(X, Y):
            if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0:
                miss += 1
                for j in range(_PERC_DIM):
                    upd[j] += y * x[j]
        if miss:
            w = [wi + _dha(uj, miss) for wi, uj in zip(w, upd)]
    expect = {
        i: sum(wi * xi for wi, xi in zip(w, x)) for i, x in zip(ids, X)
    }
    rows = QUERIES["doc_perceptron_train"](spark, SF_DIR).collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert r.margin == expect[r.doc_id], (r, expect[r.doc_id])
        assert r.y == (1 if r.doc_id % 2 == 0 else -1)
        assert r.pred == (1 if r.margin > 0 else -1)
        # the planted corpus is separable and the trainer converged
        assert r.correct, r
