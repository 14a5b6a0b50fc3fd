"""Semantic properties of the round-5 batch-68 operators:

- emb_ood_gate: dist/cell re-derived with numpy against the same
  centroid family; the 2.5x-cell-mean rule flags a small tail and the
  flagged vectors are exactly the rule's.
- events_holt_forecast: the fold re-derived step-by-step in exact
  Python integers (truncating div) over the chronologically-ordered
  hourly series; level tracks the mean hourly rate.
"""

from __future__ import annotations

import numpy as np
import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch68")


def test_ood_gate_rule(spark):
    from rcspark.datapipe.similarity import IVF_CELLS, centroid_py

    import duckdb

    rows = QUERIES["emb_ood_gate"](spark, SF_DIR).collect()
    embs = dict(
        duckdb.sql(
            f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    )
    cents = np.array(
        [[centroid_py(c, d) for d in range(64)] for c in range(IVF_CELLS)]
    )
    qcents = np.array([[round(c * 1_000_000) for c in row] for row in cents],
                      dtype=np.int64)
    flagged = 0
    for r in rows:
        base_id = r.vec_id - 1000000 if r.vec_id >= 1000000 else r.vec_id
        shift = 5.0 if r.vec_id >= 1000000 else 0.0
        v = np.array(embs[base_id], dtype=np.float64) + shift
        qv = np.array([round(x * 1_000_000) for x in v], dtype=np.int64)
        d2 = ((qv[None, :] - qcents) ** 2).sum(axis=1)
        order = sorted(range(IVF_CELLS), key=lambda c: (int(d2[c]), c))
        assert r.cell == order[0]
        assert r.dist_u == int(d2[order[0]])
        assert r.is_ood == (2 * r.dist_u > 5 * r.mean_u)
        flagged += int(r.is_ood)
    plants = [r for r in rows if r.vec_id >= 1000000]
    plain = [r for r in rows if r.vec_id < 1000000]
    assert plants and all(r.is_ood for r in plants)  # every plant flagged
    assert not any(r.is_ood for r in plain)  # homogeneous bulk passes
    assert flagged == len(plants)


def test_holt_python_fold(spark):
    import duckdb

    rows = {r.event_type: r for r in QUERIES["events_holt_forecast"](spark, SF_DIR).collect()}
    series = {}
    for et, hr, c in duckdb.sql(
        f"SELECT event_type, strftime(ts, '%Y-%m-%d %H'), count(*) "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall():
        series.setdefault(et, []).append(c)

    def trunc(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    for et, cs in series.items():
        l, t = 8 * cs[0], 0
        for c in cs[1:]:
            ln = trunc(8 * c + 3 * l, 4)
            t = trunc(ln - l + 7 * t, 8)
            l = ln
        r = rows[et]
        assert r.n_hours == len(cs)
        assert (r.level_8, r.trend_8) == (l, t), et
        assert r.forecast_next_8 == l + t
        assert r.forecast_next == trunc(l + t, 8)
        # the level tracks the recent rate: within 3x of the series mean
        mean8 = 8 * sum(cs) // len(cs)
        assert mean8 // 3 <= l <= 3 * mean8 + 8
