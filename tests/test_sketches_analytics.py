"""Semantic properties of the round-3 batch-4 operators that a
rows+schema+hash oracle can't express by itself: sketch error bounds,
funnel ordering, dedup survivor invariants."""

import pytest
from pyspark.sql import functions as F

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_sketches")


def test_cms_never_underestimates(spark):
    rows = QUERIES["agg_heavy_hitters_cms"](spark, SF_DIR).collect()
    assert rows, "CMS top-k must be non-empty"
    for r in rows:
        assert r.est >= r.exact_cnt, f"CMS underestimated {r.host}"


def test_hll_within_relative_error(spark):
    # m=64 registers -> standard error ~1.04/sqrt(64) = 13%; allow 3 sigma.
    # sf0.01 keeps every group's cardinality (~1.6k) clear of the raw-HLL
    # small-range bias region (<~5m), which the op documents as omitted.
    rows = QUERIES["agg_hll_distinct"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.exact_distinct > 0
        rel = abs(r.hll_est - r.exact_distinct) / r.exact_distinct
        assert rel < 0.40, f"{r.event_type}: HLL est {r.hll_est} vs {r.exact_distinct}"


def test_funnel_steps_strictly_ordered(spark):
    rows = QUERIES["events_funnel_steps"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        steps = [s for s in (r.t1_s, r.t2_s, r.t3_s, r.t4_s) if s is not None]
        assert steps == sorted(steps) and len(set(steps)) == len(steps)
        # depth counts exactly the non-null prefix (a later step never
        # exists without the earlier one)
        assert r.funnel_depth == len(steps)
        nulls = [s is None for s in (r.t1_s, r.t2_s, r.t3_s, r.t4_s)]
        assert nulls == sorted(nulls), "gap in funnel prefix"


def test_caption_dedup_survivor_is_best_resolution(spark):
    out = {
        r.caption: r for r in QUERIES["img_caption_dedup"](spark, SF_DIR).collect()
    }
    assert out
    # survivors are unique per caption and pixels is max over the group
    for r in out.values():
        assert r.pixels == r.w * r.h
    # the generic 'photo' class must have collapsed many pairs into one
    if "photo" in out:
        assert out["photo"].dup_count > 1


def test_span_dedup_fraction_bounds(spark):
    rows = QUERIES["doc_span_dedup"](spark, SF_DIR).collect()
    assert rows
    dup_docs = 0
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert r.dup_frac_ppm == 1_000_000 * r.n_dup_spans // r.n_spans
        dup_docs += r.n_dup_spans > 0
    assert dup_docs > 0, "corpus contains planted near-dups; spans must hit"


def test_mirror_detect_finds_exactly_planted_pairs(spark):
    rows = QUERIES["crawl_mirror_detect"](spark, SF_DIR).collect()
    assert len(rows) == 20  # every hK is mirrored by mK, nothing else
    for r in rows:
        assert r.host_a[0] == "h" and r.host_b[0] == "m"
        assert r.host_a[1:] == r.host_b[1:]
        assert r.jaccard_ppm >= 500_000
        assert r.size_b <= r.size_a  # mirror carries a subset


def test_bm25_rare_term_outranks_common(spark):
    rows = QUERIES["doc_bm25_topk"](spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {
        "q_hash_join",
        "q_sort_merge",
        "q_dup_scan",
        "q_window_filter_batch",
    }
    for q, rs in by_q.items():
        scores = [r.score for r in sorted(rs, key=lambda r: r.rnk)]
        assert scores == sorted(scores, reverse=True)


def test_ip_politeness_budget_respected(spark):
    rows = QUERIES["crawl_ip_politeness"](spark, SF_DIR).collect()
    assert rows
    per_ip = {}
    for r in rows:
        per_ip.setdefault(r.ip, []).append(r)
    for ip, rs in per_ip.items():
        assert len(rs) <= 8  # _IP_BUDGET
        assert {r.rn for r in rs} == set(range(1, len(rs) + 1))
        # hosts sharing an IP share ONE budget (the collapse is real):
        # n_hosts_on_ip is consistent across the group
        assert len({r.n_hosts_on_ip for r in rs}) == 1


def test_minhash_estimate_tracks_exact_jaccard(spark):
    rows = QUERIES["doc_minhash_est_error"](spark, SF_DIR).collect()
    assert rows
    # k=16 signature: granularity 62.5k ppm; 3-sigma binomial bound at
    # the sample level — check the AGGREGATE bias, not per-pair noise.
    mean_err = sum(r.err_ppm for r in rows) / len(rows)
    assert abs(mean_err) < 150_000, f"MinHash estimator biased: {mean_err} ppm"
    for r in rows:
        assert 0 <= r.n_match <= 16
        assert 0 <= r.jaccard_ppm <= 1_000_000
