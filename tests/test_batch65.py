"""Semantic properties of the round-5 batch-65 operators:

- crawl_host_shard_plan: the zigzag rule beats naive hash placement on
  the same load vector (lower max-shard load), the plan covers every
  host exactly once, shard loads re-derive from the per-host loads, and
  imbalance_ppm matches its definition.
- warehouse_clustering_depth: modulus sharding of the clustering key
  interleaves ranges, so every shard's zonemap overlaps all others
  (depth 15 of 16) — while sharding by digest RANGE drives depth to 0
  (re-derived in Python as the contrast).
"""

from __future__ import annotations

import pytest

from rcspark.datapipe.hashing import digest60_py
from rcspark.queries import _SHARD_PLAN_N, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch65")


def test_shard_plan_beats_hash_placement(spark):
    rows = QUERIES["crawl_host_shard_plan"](spark, SF_DIR).collect()
    assert len({r.host for r in rows}) == len(rows)
    loads = {}
    for r in rows:
        loads[r.shard] = loads.get(r.shard, 0) + r.n_urls
    for r in rows:
        assert r.shard_load == loads[r.shard]
    total = sum(loads.values())
    imb = 1_000_000 * max(loads.values()) * _SHARD_PLAN_N // total
    assert rows[0].imbalance_ppm == imb
    assert imb < 1_200_000  # within 20% of perfect balance
    # naive hash placement on the same load vector
    hash_loads = {}
    for r in rows:
        s = digest60_py("hp:" + r.host) % _SHARD_PLAN_N
        hash_loads[s] = hash_loads.get(s, 0) + r.n_urls
    assert max(loads.values()) <= max(hash_loads.values())
    # zigzag rank rule holds per row
    m = 2 * _SHARD_PLAN_N
    for r in rows:
        exp = r.rk % m if r.rk % m < _SHARD_PLAN_N else (m - 1) - r.rk % m
        assert r.shard == exp


def test_clustering_depth_modulus_vs_range(spark):
    import duckdb

    rows = QUERIES["warehouse_clustering_depth"](spark, SF_DIR).collect()
    assert len(rows) == 16
    for r in rows:
        assert r.depth == 15  # modulus sharding: everything overlaps
    # contrast: range sharding the same digests gives depth 0
    dgs = sorted(
        digest60_py(f"u{k}")
        for (k,) in duckdb.sql(
            f"SELECT o_orderkey FROM '{SF_DIR}/orders.parquet'"
        ).fetchall()
    )
    n = len(dgs)
    ranges = []
    for s in range(16):
        chunk = dgs[s * n // 16 : (s + 1) * n // 16]
        if chunk:
            ranges.append((chunk[0], chunk[-1]))
    for i, (lo, hi) in enumerate(ranges):
        for j, (lo2, hi2) in enumerate(ranges):
            if i != j:
                assert hi < lo2 or hi2 < lo  # disjoint → depth 0
