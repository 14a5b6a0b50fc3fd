"""Semantic properties of the round-5 batch-73 operator:

- emb_kcenter_init: the full greedy run re-derived in numpy int64
  (selection order, d_sel values, final radius), the d_sel sequence is
  non-increasing (each new farthest point is no farther than the last),
  and the Gonzalez invariant holds: every pairwise distance between
  chosen centers >= the final covering radius.  Seeding-quality claim:
  the greedy radius beats the digest-seeded init's radius on the same
  k (the spread is the point).
"""

from __future__ import annotations

import numpy as np
import pytest

from rcspark.datapipe.hashing import digest60_py
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch73")


def test_kcenter_greedy_twin_and_invariant(spark):
    import duckdb

    rows = sorted(
        QUERIES["emb_kcenter_init"](spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    data = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
    ).fetchall()
    ids = [v for v, _ in data]
    q = {
        v: np.array([round(float(x) * 1_000_000) for x in e], dtype=np.int64)
        for v, e in data
    }
    first = min(ids, key=lambda v: (digest60_py(f"kpp:{v}"), v))
    chosen = [first]
    dmin = {v: int(((q[v] - q[first]) ** 2).sum()) for v in ids}
    expect = [(0, first, None)]
    for t in range(1, K):
        nxt = max(ids, key=lambda v: (dmin[v], -v))
        expect.append((t, nxt, dmin[nxt]))
        chosen.append(nxt)
        for v in ids:
            dmin[v] = min(dmin[v], int(((q[v] - q[nxt]) ** 2).sum()))
    radius = max(dmin.values())
    got = [(r.round, r.vec_id, r.d_sel) for r in rows]
    assert got == expect
    assert all(r.final_radius == radius for r in rows)
    d_sels = [r.d_sel for r in rows if r.d_sel is not None]
    assert d_sels == sorted(d_sels, reverse=True)  # non-increasing
    # Gonzalez invariant: pairwise center distances >= final radius
    for i in range(K):
        for j in range(i + 1, K):
            dij = int(((q[chosen[i]] - q[chosen[j]]) ** 2).sum())
            assert dij >= radius
    # beats the digest-seeded init (first 8 by digest order) on radius
    seeded = sorted(ids, key=lambda v: (digest60_py(f"kpp:{v}"), v))[:K]
    sd = {
        v: min(int(((q[v] - q[c]) ** 2).sum()) for c in seeded) for v in ids
    }
    assert radius < max(sd.values())
