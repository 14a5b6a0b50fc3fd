"""Semantic properties of the round-4 batch-28 operators — invariants the
rows+schema+hash oracles can't state: the MIH pigeonhole completeness
guarantee (every radius-≤3 pair IS found), aspect-bucket batch packing laws
+ the no-SinglePartition plan shape, and streaming-vs-batch phash-dedup set
equality."""

import numpy as np
import pytest

from rcspark.queries import _ASPECT_BATCH, _ASPECT_BUCKETS, _MIH_RADIUS, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch28")


# -- img_phash_mih_search ---------------------------------------------------------


def test_mih_completeness_within_radius(spark):
    rows = QUERIES["img_phash_mih_search"](spark, SF_DIR).collect()
    found = {(r.probe_id, r.image_id): r.hamming for r in rows}
    assert found, "planted probes must match"
    # independent brute force: recompute every probe/corpus hamming pair
    # from the expected parquet and assert the radius-bounded set is
    # EXACTLY what the banded search returned (MIH's pigeonhole claim)
    import pandas as pd

    from rcspark.queries import _MEDIA_EXPECTED

    feats = pd.read_parquet(f"{_MEDIA_EXPECTED}/img_features.parquet")
    feats["k"] = feats.image_id.str[3:].astype(int)
    corpus = feats[feats.k < 200]  # sf0.001 part: p_partkey 0..199
    from rcspark.datapipe.hashing import digest60_py

    expected = {}
    for _, p in corpus[corpus.k % 100 == 0].iterrows():
        d = digest60_py(f"mih:{p.k}")
        mask = (1 << (d % 60)) | (1 << ((d // 60) % 60)) | (1 << ((d // 3600) % 60))
        pq = np.int64(p.phash) ^ np.int64(np.uint64(mask).astype(np.int64))
        for _, c in corpus.iterrows():
            ham = bin(int(np.uint64(np.int64(pq) ^ np.int64(c.phash)))).count("1")
            if ham <= _MIH_RADIUS:
                expected[(f"probe{p.k}", c.image_id)] = ham
    assert found == expected
    # each probe provably finds its source (≤3 planted flips)
    for pid in {r.probe_id for r in rows}:
        assert (pid, "img" + pid[5:]) in found


# -- img_aspect_bucket --------------------------------------------------------------


def test_aspect_bucket_packing_laws(spark):
    rows = QUERIES["img_aspect_bucket"](spark, SF_DIR).collect()
    assert rows
    by_bucket = {}
    for r in rows:
        # election recheck: argmin |aspect - target| with ties to the
        # smaller target
        want = min(_ASPECT_BUCKETS,
                   key=lambda tn: (abs(r.aspect_permille - tn[0]), tn[0]))[1]
        assert r.bucket == want
        assert r.aspect_permille == 1000 * r.w // r.h
        assert r.batch_idx == r.seq // _ASPECT_BATCH
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        seqs = sorted(r.seq for r in rs)
        assert seqs == list(range(len(rs))), f"{bucket}: seq not dense"
        order = sorted(rs, key=lambda r: r.image_id)
        assert [r.seq for r in order] == seqs, f"{bucket}: seq order broken"


def test_aspect_bucket_plan_no_single_partition_sort(spark):
    df = QUERIES["img_aspect_bucket"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    for ln in plan.splitlines():
        if "Exchange SinglePartition" in ln:
            pytest.fail(f"single-partition exchange in packing plan:\n{plan}")


# -- stream_img_phash_dedup ----------------------------------------------------------


def test_stream_phash_dedup_matches_batch(spark):
    streamed = sorted(
        r.phash for r in QUERIES["stream_img_phash_dedup"](spark, SF_DIR).collect()
    )
    from rcspark.datapipe.multimodal import image_features, synthesize_images
    from pyspark.sql import functions as F

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    ids = part.filter(F.col("p_partkey") % 10 == 0).select(
        F.concat(
            F.lit("img"),
            (F.col("p_partkey") - F.col("p_partkey") % 500).cast("string"),
        ).alias("image_id")
    ).distinct()
    batch = sorted(
        r.phash for r in image_features(synthesize_images(ids)).select("phash")
        .distinct().collect()
    )
    assert streamed == batch and len(streamed) >= 1
