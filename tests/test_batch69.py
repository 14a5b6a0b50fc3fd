"""Semantic properties of the round-5 batch-69 operators:

- crawl_rendezvous_shards: per-host HRW elections re-derived in Python;
  the minimal-motion law — moved fraction ≈ 1/9 (within 3x of it),
  FAR below modulo resharding's ~8/9 on the same keys; every moved
  host's new shard is exactly shard 8 (the only new winner possible).
- events_changepoint_binseg: best split re-derived by exhaustive exact
  rational comparison (A²·D' vs A'²·D cross-multiplied — no integer-div
  approximation), confirming the integer-div election picks the same k;
  split means re-derived.
"""

from __future__ import annotations

import pytest

from rcspark.datapipe.hashing import digest60_py
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch69")


def test_rendezvous_minimal_motion(spark):
    rows = QUERIES["crawl_rendezvous_shards"](spark, SF_DIR).collect()
    assert rows
    moved = 0
    mod_moved = 0
    for r in rows:
        w8 = max(range(8), key=lambda s: (digest60_py(f"hrw:{s}:{r.host}"), s))
        w9 = max(range(9), key=lambda s: (digest60_py(f"hrw:{s}:{r.host}"), s))
        assert (r.shard8, r.shard9) == (w8, w9)
        assert r.moved == (w8 != w9)
        if r.moved:
            moved += 1
            assert r.shard9 == 8  # only the NEW shard can steal a key
        hd = digest60_py("hp:" + r.host)
        if hd % 8 != hd % 9:
            mod_moved += 1
    n = len(rows)
    assert rows[0].moved_ppm == 1_000_000 * moved // n
    assert moved / n < 3 * (1 / 9)
    assert mod_moved / n > 0.5  # modulo reshuffles the majority
    assert moved < mod_moved


def test_changepoint_exact_rational_election(spark):
    import duckdb

    rows = {
        r.event_type: r
        for r in QUERIES["events_changepoint_binseg"](spark, SF_DIR).collect()
    }
    series = {}
    for et, hr, c in duckdb.sql(
        f"SELECT event_type, strftime(ts, '%Y-%m-%d %H'), count(*) "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall():
        series.setdefault(et, []).append((hr, c))
    for et, hc in series.items():
        cs = [c for _, c in hc]
        n, s = len(cs), sum(cs)
        best = None  # (A², D, k) with exact rational comparison
        s1 = 0
        for k in range(1, n):
            s1 += cs[k - 1]
            a2 = (n * s1 - k * s) ** 2
            d = k * (n - k)
            if best is None or a2 * best[1] > best[0] * d or (
                a2 * best[1] == best[0] * d and k < best[2]
            ):
                best = (a2, d, k, s1)
        a2, d, k, s1 = best
        r = rows[et]
        assert r.split_k == k, (et, r.split_k, k)
        assert r.split_hr == hc[k - 1][0]
        assert r.score == a2 // d
        assert r.mean_before_milli == 1000 * s1 // k
        assert r.mean_after_milli == 1000 * (s - s1) // (n - k)
