"""Multi-seed crawl-order fuzz: the engine-vs-oracle equality must hold for
ANY fixture, not just the seeds the main e2e uses. Small webs keep each
seed under a minute; order + seen-set are the checked invariants (captions/
pixels/lineage are covered at depth in test_crawl_e2e)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from rcspark.fixtures import make_fixture
from rcspark.oracle import run_oracle
from tests.test_crawl_e2e import run_engine


@pytest.mark.parametrize("seed", [3, 5, 17, 29, 41])
def test_order_and_seen_equality_fuzz(spark, tmp_path, seed):
    fx = make_fixture(n_hosts=4, urls_per_host=12, link_fanout=4.0, seed=seed)
    orc = run_oracle(fx)
    root = str(tmp_path / f"wh{seed}")
    eng = run_engine(spark, fx, root)
    try:
        log = eng.fetch_log().filter(F.col("seq").isNotNull()).orderBy("seq").collect()
        engine_order = [(r.seq, r.url_canon, r.wave, r.fetch_ms, r.result) for r in log]
        oracle_order = [
            (r["seq"], r["url_canon"], r["wave"], r["fetch_ms"], r["result"])
            for r in orc.order
        ]
        assert engine_order == oracle_order, f"seed={seed}"
        assert {r.url_canon for r in eng.seen_table().collect()} == orc.seen
    finally:
        shutil.rmtree(root, ignore_errors=True)
