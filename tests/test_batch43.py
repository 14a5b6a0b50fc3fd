"""Batch-43 pins: CCNet tercile laws + window-free plan, and the
embedding drift monitor's total-variation arithmetic.
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch43")


def test_ccnet_bucket_laws(spark):
    rows = QUERIES["doc_ccnet_buckets"](spark, SF_DIR).collect()
    assert rows
    n = len(rows)
    t_tail = rows[0].t_tail_ppm
    t_middle = rows[0].t_middle_ppm
    assert all(r.t_tail_ppm == t_tail and r.t_middle_ppm == t_middle
               for r in rows)
    assert t_tail <= t_middle
    by = {"tail": [], "middle": [], "head": []}
    for r in rows:
        if r.lm_score_ppm <= t_tail:
            assert r.bucket == "tail"
        elif r.lm_score_ppm <= t_middle:
            assert r.bucket == "middle"
        else:
            assert r.bucket == "head"
        by[r.bucket].append(r.lm_score_ppm)
    assert all(by.values())
    # value-threshold buckets: ordered by construction, and the tail holds
    # AT LEAST its tercile of rows (ties only grow it)
    assert max(by["tail"]) <= min(by["middle"])
    assert max(by["middle"]) <= min(by["head"])
    assert len(by["tail"]) >= n // 3
    assert len(by["tail"]) + len(by["middle"]) >= (2 * n) // 3


def test_ccnet_plan_window_free(spark):
    df = QUERIES["doc_ccnet_buckets"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Exchange rangepartitioning" in plan, plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "Sort" not in child, plan


def test_cell_drift_tv_arithmetic(spark):
    rows = sorted(QUERIES["emb_cell_drift"](spark, SF_DIR).collect(),
                  key=lambda r: r.cell)
    assert len(rows) == 8
    ta = sum(r.n_a for r in rows)
    tb = sum(r.n_b for r in rows)
    assert ta == tb  # snapshot B permutes vectors, never adds/drops
    tv = sum(abs(r.share_a_ppm - r.share_b_ppm) for r in rows) // 2
    for r in rows:
        assert r.share_a_ppm == r.n_a * 1_000_000 // ta
        assert r.share_b_ppm == r.n_b * 1_000_000 // tb
        assert r.delta_ppm == abs(r.share_a_ppm - r.share_b_ppm)
        assert r.tv_ppm == tv
        assert r.drifted == (tv > 100_000)
    # the planted dim-reversal must actually move mass between cells
    assert any(r.n_a != r.n_b for r in rows)
