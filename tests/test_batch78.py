"""Semantic property of the round-5 batch-78 operator:

- crawl_politeness_audit: the invariant the politeness tier exists for —
  ZERO violations over the real scheduler output (every host polite),
  min gaps equal the host's delay exactly (the schedule packs at the
  delay), and multi-fetch hosts exist so the audit is non-vacuous.
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch78")


def test_politeness_invariant_holds(spark):
    rows = QUERIES["crawl_politeness_audit"](spark, SF_DIR).collect()
    assert rows
    multi = 0
    for r in rows:
        hn = int(r.host[1:].split(".")[0])
        want_delay = round(max([0.0, 0.5, 1.0, 2.0][hn % 4], 0.5) * 1000)
        assert r.delay_ms == want_delay
        assert r.violations == 0 and r.polite
        if r.n_scheduled > 1:
            multi += 1
            # the schedule packs fetches exactly at the delay
            assert r.min_gap_ms == r.delay_ms
        else:
            assert r.min_gap_ms is None
    assert multi > 0
