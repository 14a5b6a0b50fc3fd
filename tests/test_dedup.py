"""Partitioned Bloom + exact anti-join dedup (SURVEY.md A4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rcspark.constants import BLOOM_BITS_PER_SHARD, BLOOM_NUM_HASHES
from rcspark.dedup import bloom_probe, bloom_update, empty_bloom, filter_unseen


def _digests(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url_canon"]).withColumn(
        "digest", F.xxhash64("url_canon")
    )


@pytest.fixture(scope="module")
def bloom_with_5k(spark):
    inserted = [f"http://h{i % 7}.example/p/{i}" for i in range(5000)]
    bloom = bloom_update(_digests(spark, inserted), empty_bloom(spark)).persist()
    bloom.count()
    return inserted, bloom


def test_bloom_no_false_negatives(spark, bloom_with_5k):
    inserted, bloom = bloom_with_5k
    probed = bloom_probe(_digests(spark, inserted), bloom)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_fpr_bounded(spark, bloom_with_5k):
    _, bloom = bloom_with_5k
    novel = [f"http://other{i % 5}.example/q/{i}" for i in range(20000)]
    fp = bloom_probe(_digests(spark, novel), bloom).filter(F.col("maybe_seen")).count()
    # theoretical FPR at n=5000/32 shards, m=2^20, k=7 is ~1e-17; any
    # measurable rate means broken mixing — allow a generous 0.1%
    assert fp / len(novel) < 0.001, fp


def test_filter_unseen_exact(spark, bloom_with_5k):
    inserted, bloom = bloom_with_5k
    seen = _digests(spark, inserted).withColumn("wave", F.lit(0))
    mixed = inserted[:500] + [f"http://fresh.example/n/{i}" for i in range(500)]
    out = filter_unseen(_digests(spark, mixed), bloom, seen)
    got = sorted(r.url_canon for r in out.collect())
    assert got == sorted(f"http://fresh.example/n/{i}" for i in range(500))


def test_filter_unseen_auto_switches_probe_path(spark, bloom_with_5k):
    """The broadcast-vs-cogroup switch (VERDICT r1 #7) picks by measured
    sketch bytes: a 0-byte threshold must force the cogroup branch, the
    default must take the broadcast branch, and BOTH must return the same
    rows (the switch is a physical-plan choice, never a semantics one)."""
    inserted, bloom = bloom_with_5k
    seen = _digests(spark, inserted).withColumn("wave", F.lit(0))
    mixed = inserted[:200] + [f"http://fresh.example/s/{i}" for i in range(200)]
    res_bcast: list = []
    out_bcast = filter_unseen(
        _digests(spark, mixed), bloom, seen, persisted_out=res_bcast
    )
    got_bcast = sorted(r.url_canon for r in out_bcast.collect())
    # broadcast branch leaves its Broadcast handle in persisted_out
    from pyspark.broadcast import Broadcast

    assert any(isinstance(h, Broadcast) for h in res_bcast)

    res_cg: list = []
    out_cg = filter_unseen(
        _digests(spark, mixed), bloom, seen,
        persisted_out=res_cg, broadcast_max_bytes=0,
    )
    got_cg = sorted(r.url_canon for r in out_cg.collect())
    assert not any(isinstance(h, Broadcast) for h in res_cg)
    assert got_bcast == got_cg == sorted(
        f"http://fresh.example/s/{i}" for i in range(200)
    )
    for h in (*res_bcast, *res_cg):
        h.unpersist()


def test_bloom_update_preserves_untouched_shards(spark):
    b0 = bloom_update(_digests(spark, ["http://a.example/1"]), empty_bloom(spark))
    before = {r.shard: r.bits for r in b0.collect()}
    b1 = bloom_update(_digests(spark, ["http://a.example/2"]), b0)
    after = {r.shard: r.bits for r in b1.collect()}
    assert set(before) == set(after) == set(range(len(before)))
    changed = [s for s in before if before[s] != after[s]]
    assert len(changed) == 1  # exactly the target shard mutated
    assert all(len(bytes(v)) == BLOOM_BITS_PER_SHARD // 8 for v in after.values())
