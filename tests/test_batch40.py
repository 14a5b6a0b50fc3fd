"""Semantic properties of the round-5 batch-40 operators — the
training-corpus construction plane:

- emb_diversity_sample: the hash-rate selection law re-derived per row
  (digest60 recomputed in Python), keep_ppm = 1e6*isqrt(n)//n, and the
  balance property (smaller cells keep a HIGHER fraction).
- img_shard_layout: tar arithmetic — 512-aligned offsets, contiguous
  positions, offset recurrence, closed-shard total.
- doc_dsir_weights: feature count law (2w-1), keep threshold law, and
  target docs scoring more target-like than source docs on average.

Plan pins: diversity sampling is window-free (the rate rule replaces
row_number-per-cell); the shard layout's only exchange is the per-shard
window partitioning.
"""

from __future__ import annotations

import math

import pytest

from rcspark.datapipe.hashing import digest60_py
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch40")


def test_diversity_sample_laws(spark):
    rows = QUERIES["emb_diversity_sample"](spark, SF_DIR).collect()
    assert rows
    by_cell = {}
    for r in rows:
        iq = math.isqrt(r.cell_size)
        assert r.keep_ppm == 1_000_000 * iq // r.cell_size
        h = digest60_py(f"div:{r.vec_id}")
        assert r.kept == ((h % 1_000_000) * r.cell_size < 1_000_000 * iq)
        by_cell.setdefault(r.cell, []).append(r)
    # every vec appears exactly once; cell sizes are consistent
    assert sum(len(v) for v in by_cell.values()) == len(rows)
    for cell, rs in by_cell.items():
        assert len({r.cell_size for r in rs}) == 1
        assert rs[0].cell_size == len(rs)
    # balance: the smallest cell's keep RATE >= the largest cell's
    sizes = sorted(by_cell, key=lambda c: by_cell[c][0].cell_size)
    small, large = by_cell[sizes[0]][0], by_cell[sizes[-1]][0]
    if small.cell_size < large.cell_size:
        assert small.keep_ppm >= large.keep_ppm


def test_diversity_sample_plan_window_free(spark):
    df = QUERIES["emb_diversity_sample"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_shard_layout_tar_arithmetic(spark):
    rows = QUERIES["img_shard_layout"](spark, SF_DIR).collect()
    assert rows
    shards = {}
    for r in rows:
        assert r.record_bytes == 512 + 512 * ((r.sample_bytes + 511) // 512)
        assert r.byte_offset % 512 == 0
        shards.setdefault(r.shard, []).append(r)
    assert len(shards) > 1
    for shard, rs in shards.items():
        rs.sort(key=lambda r: r.pos)
        assert [r.pos for r in rs] == list(range(1, len(rs) + 1))
        off = 0
        for r in rs:
            assert r.byte_offset == off
            off += r.record_bytes
        total = sum(r.record_bytes for r in rs) + 1024
        assert all(r.shard_bytes == total for r in rs)


def test_shard_layout_single_exchange(spark):
    df = QUERIES["img_shard_layout"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_dsir_weight_laws(spark):
    rows = QUERIES["doc_dsir_weights"](spark, SF_DIR).collect()
    assert rows
    tgt, src = [], []
    for r in rows:
        assert r.is_target == (r.doc_id % 3 == 0)
        if r.n_feats > 0:
            assert r.avg_ratio_ppm == r.sum_ratio_ppm // r.n_feats
            assert r.keep == (r.avg_ratio_ppm >= 1_000_000)
        else:
            assert r.avg_ratio_ppm is None and not r.keep
        (tgt if r.is_target else src).append(r)
    assert tgt and src
    # target docs are the target sample: their hashed n-grams have the
    # high t_b counts, so their mean ratio must exceed the source mean
    mean = lambda rs: sum(r.avg_ratio_ppm or 0 for r in rs) / len(rs)  # noqa: E731
    assert mean(tgt) > mean(src)
    # and the feature count law: unigrams + bigrams = 2w - 1 for w >= 1
    assert all(r.n_feats == 0 or r.n_feats % 2 == 1 for r in rows)
