"""Semantic properties of the round-5 batch-77 operators:

- doc_containment_pairs: the asymmetry claim demonstrated directly — a
  constructed subset document (tokens of a larger doc's first half) has
  containment ~1 on its side while Jaccard stays < 0.8; per-row ppm
  arithmetic re-derived; verdict precedence duplicate > inclusion >
  overlap.
- crawl_hostname_confusables: exactly the 1-in-10 planted hosts flag as
  homograph_suspect, the Cyrillic byte really is U+043E (not 'o'), and
  clean hostnames never flag.
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch77")


def test_containment_arithmetic_and_asymmetry(spark):
    rows = QUERIES["doc_containment_pairs"](spark, SF_DIR).collect()
    assert rows
    verdicts = set()
    for r in rows:
        union = r.size_a + r.size_b - r.inter
        assert r.j_ppm == 1_000_000 * r.inter // union
        assert r.cont_a_ppm == 1_000_000 * r.inter // r.size_a
        assert r.cont_b_ppm == 1_000_000 * r.inter // r.size_b
        assert max(r.cont_a_ppm, r.cont_b_ppm) >= r.j_ppm
        if r.j_ppm >= 800_000:
            assert r.verdict == "duplicate"
        elif max(r.cont_a_ppm, r.cont_b_ppm) >= 900_000:
            assert r.verdict == "inclusion"
        else:
            assert r.verdict == "overlap"
        verdicts.add(r.verdict)
    assert "overlap" in verdicts
    # direct asymmetry demo on constructed sets
    big = {f"s{i}" for i in range(100)}
    small = {f"s{i}" for i in range(40)}
    inter = len(big & small)
    j = inter / len(big | small)
    cont_small = inter / len(small)
    assert cont_small == 1.0 and j < 0.8  # inclusion invisible to Jaccard


def test_homograph_plants(spark):
    rows = QUERIES["crawl_hostname_confusables"](spark, SF_DIR).collect()
    assert len(rows) == 50
    n_sus = 0
    for r in rows:
        hn = int("".join(ch for ch in r.hostname if ch.isdigit()))
        if hn % 10 == 3:
            assert r.verdict == "homograph_suspect"
            assert "о" in r.hostname  # the Cyrillic о
            assert r.mixed_script
            n_sus += 1
        else:
            assert r.verdict == "ok" and not r.has_cyrillic
    assert n_sus == 5
