"""Semantic properties of the round-5 batch-60 operators:

- agg_kmv_setops: exact counts re-derived in pure Python from the
  parquet; KMV estimates land within the k=128 error envelope (≤30%
  relative, ~3.5 std); the Jaccard estimate tracks the true Jaccard of
  the two customer sets within 0.15 absolute.
- img_pair_dataset_card: every card column re-derived by aggregating
  the manifest query's own rows in Python (totals, gate partition,
  placement spread, caption stats).
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch60")


def test_kmv_estimates_within_envelope(spark):
    import duckdb

    a, b = set(), set()
    for ok, ck in duckdb.sql(
        f"SELECT o_orderkey, o_custkey FROM '{SF_DIR}/orders.parquet'"
    ).fetchall():
        (a if ok % 2 == 0 else b).add(ck)
    row = QUERIES["agg_kmv_setops"](spark, SF_DIR).collect()[0]
    assert row.exact_a == len(a) and row.exact_b == len(b)
    true_union = len(a | b)
    true_j = len(a & b) / true_union
    for est, exact in (
        (row.est_a, len(a)),
        (row.est_b, len(b)),
        (row.est_union, true_union),
    ):
        assert abs(est - exact) <= max(3, 0.30 * exact), (est, exact)
    assert abs(row.jaccard_est_ppm / 1e6 - true_j) <= 0.15


def test_pair_card_matches_manifest_rows(spark):
    card = QUERIES["img_pair_dataset_card"](spark, SF_DIR).collect()[0]
    rows = QUERIES["img_pair_manifest"](spark, SF_DIR).collect()
    keep = [r for r in rows if r.keep]
    assert card.n_pairs == len(rows)
    assert card.n_keep == len(keep)
    assert card.keep_ppm == 1_000_000 * len(keep) // len(rows)
    reasons = {}
    for r in rows:
        reasons[r.reason] = reasons.get(r.reason, 0) + 1
    assert card.n_caption_blocked == reasons.get("caption_blocked", 0)
    assert card.n_caption_len == reasons.get("caption_len", 0)
    assert card.n_dims == reasons.get("dims", 0)
    assert card.n_color_cast == reasons.get("color_cast", 0)
    # the gates partition the rejects
    assert (
        card.n_caption_blocked + card.n_caption_len + card.n_dims
        + card.n_color_cast + card.n_keep
        == card.n_pairs
    )
    assert card.n_buckets == len({r.bucket for r in keep})
    assert card.n_shards == len({r.shard for r in keep})
    toks = [r.n_cap_tokens for r in keep]
    assert card.cap_tok_min == min(toks)
    assert card.cap_tok_max == max(toks)
    assert card.cap_tok_mean_ppm == 1_000_000 * sum(toks) // len(toks)
