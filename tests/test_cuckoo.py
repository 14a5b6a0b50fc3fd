"""Cuckoo-filter URL-seen tests: no false negatives, measured FPR, O(1)
delete (the property Bloom can't offer — media expiry, A17), and dedup
parity with the exact anti-join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rcspark.cuckoo import (
    NBUCKETS,
    SLOTS,
    _delete_batch,
    _insert_batch,
    _probe_batch,
    cuckoo_delete,
    cuckoo_probe_broadcast,
    cuckoo_update,
    empty_cuckoo,
    filter_unseen_cuckoo,
)


# ---------------------------------------------------------------- numpy core

def test_no_false_negatives_and_fpr():
    rng = np.random.default_rng(1)
    table = np.zeros((NBUCKETS, SLOTS), dtype=np.uint16)
    inserted = rng.integers(-(2**62), 2**62, 20_000, dtype=np.int64)
    _insert_batch(table, inserted, rng_seed=0)
    assert _probe_batch(table, inserted).all()  # zero false negatives
    other = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    other = np.setdiff1d(other, inserted)
    fpr = _probe_batch(table, other).mean()
    assert fpr < 0.005, fpr  # 16-bit fp, 4 slots → expect ~0.012%


def test_delete_removes_membership():
    table = np.zeros((NBUCKETS, SLOTS), dtype=np.uint16)
    keys = np.arange(1000, dtype=np.int64) * 7919
    _insert_batch(table, keys, rng_seed=0)
    removed = _delete_batch(table, keys[:500])
    assert removed == 500
    assert _probe_batch(table, keys[500:]).all()  # survivors intact
    # deleted keys may only survive as (rare) fingerprint collisions
    assert _probe_batch(table, keys[:500]).mean() < 0.01


# ------------------------------------------------------------- Spark surface

@pytest.fixture(scope="module")
def urls(spark):
    rows = [(f"http://h{i % 9}.example/p/{i}",) for i in range(3000)]
    return (
        spark.createDataFrame(rows, "url_canon string")
        .withColumn("digest", F.xxhash64("url_canon"))
        .persist()
    )


def test_spark_update_probe_delete(spark, urls):
    seen = urls.filter(F.col("digest") % 3 == 0)
    ck = cuckoo_update(seen.select("digest"), empty_cuckoo(spark)).persist()
    probed = cuckoo_probe_broadcast(urls, ck)
    got = {r["url_canon"]: r["maybe_seen"] for r in probed.collect()}
    for r in seen.collect():
        assert got[r["url_canon"]]  # every seen URL probes positive
    # delete half the seen set → those mostly probe negative now
    dels = seen.filter(F.col("digest") % 2 == 0)
    ck2 = cuckoo_delete(dels.select("digest"), ck).persist()
    probed2 = cuckoo_probe_broadcast(dels, ck2)
    frac = np.mean([r["maybe_seen"] for r in probed2.collect()])
    assert frac < 0.02
    kept = seen.join(dels.select("digest"), "digest", "left_anti")
    probed3 = cuckoo_probe_broadcast(kept, ck2)
    assert all(r["maybe_seen"] for r in probed3.collect())


def test_filter_unseen_cuckoo_equals_exact_antijoin(spark, urls):
    seen = urls.filter(F.col("digest") % 3 == 0).select("digest", "url_canon")
    ck = cuckoo_update(seen.select("digest"), empty_cuckoo(spark))
    got = sorted(
        r["url_canon"]
        for r in filter_unseen_cuckoo(urls, ck, seen).select("url_canon").collect()
    )
    want = sorted(
        r["url_canon"]
        for r in urls.join(seen.select("digest", "url_canon"), ["digest", "url_canon"], "left_anti").collect()
    )
    assert got == want
