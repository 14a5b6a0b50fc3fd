"""Semantic properties of the round-5 batch-47 operators:

- emb_aesthetic_score: the probe is a genuine linear functional (score of
  a vector equals bias + dot with the re-derived plane-900 weights,
  checked against an independent numpy recompute), bucket/keep laws hold.
- doc_incremental_dedup: planted copies (new doc_id%8==3 carries history
  doc_id-1's text) are caught with jaccard 1.0 and dup_of == doc_id-1;
  0-candidate new docs are admitted; only wave-3 docs appear; admitted
  is exactly "no verified dup".
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch47")


def test_aesthetic_matches_numpy_probe(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from rcspark.datapipe.similarity import plane_weight_py

    rows = QUERIES["emb_aesthetic_score"](spark, SF_DIR).collect()
    assert len(rows) == 500
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    emb = {i: v for i, v in zip(tbl["vec_id"], tbl["embedding"])}
    w = np.array([plane_weight_py(900, d) for d in range(64)])
    for r in rows[:50]:
        # strict left-to-right double fold, like the engine
        acc = 0.0
        for x, wd in zip(emb[r.vec_id], w):
            acc += float(np.float64(x) * wd)
        assert abs(round(5.0 + acc, 6) - r.aesthetic) < 1e-9
        assert r.keep == (r.aesthetic >= 5.0)
        assert r.score_bucket == int(np.floor(r.aesthetic))


def test_incremental_dedup_planted_copies(spark):
    rows = QUERIES["doc_incremental_dedup"](spark, SF_DIR).collect()
    by = {r.doc_id: r for r in rows}
    # only wave-3 (new) docs are audited
    assert all(k % 4 == 3 for k in by)
    assert len(by) == 125
    planted = [r for r in rows if r.doc_id % 8 == 3]
    assert planted
    for r in planted:
        assert not r.admitted, r
        assert r.best_jaccard == 1.0
        # the election winner is the planted source unless an identical
        # history doc with a smaller id exists; either way jaccard is 1.0
        assert r.dup_of is not None and r.dup_of % 4 != 3
        assert r.n_dups >= 1 and r.n_candidates >= r.n_dups
    for r in rows:
        if r.n_candidates == 0:
            assert r.admitted and r.best_jaccard is None and r.dup_of is None
        assert r.admitted == (r.n_dups == 0)
