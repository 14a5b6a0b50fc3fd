"""Semantic property of the round-5 batch-76 operator:

- events_dispersion_index: the cross-multiplied integer form re-derived
  in Python and checked against the float variance/mean ratio (within
  integer-division rounding); a planted bursty series (all mass in one
  hour) reads strongly overdispersed while a constant series reads 0.
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch76")


def _disp_ppm(cs):
    n, s = len(cs), sum(cs)
    ss = sum((n * c - s) ** 2 for c in cs)
    return 1_000_000 * ss // (n * (n - 1) * s)


def test_dispersion_twin_and_calibration(spark):
    import duckdb

    rows = {
        r.event_type: r
        for r in QUERIES["events_dispersion_index"](spark, SF_DIR).collect()
    }
    series = {}
    for et, hr, c in duckdb.sql(
        f"SELECT event_type, strftime(ts, '%Y-%m-%d %H'), count(*) "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2"
    ).fetchall():
        series.setdefault(et, []).append(c)
    for et, cs in series.items():
        r = rows[et]
        assert (r.n, r.s) == (len(cs), sum(cs))
        assert r.dispersion_ppm == _disp_ppm(cs)
        # integer form vs float Fisher index: within 1 ppm-unit rounding
        n, s = len(cs), sum(cs)
        mean = s / n
        var = sum((c - mean) ** 2 for c in cs) / (n - 1)
        assert abs(r.dispersion_ppm / 1e6 - var / mean) < 1e-3
        assert r.overdispersed == (r.dispersion_ppm > 2_000_000)
    # calibration on synthetic series
    assert _disp_ppm([5] * 100) == 0  # constant → D = 0
    burst = [0] * 99 + [500]
    assert _disp_ppm(burst) > 50 * 1_000_000  # all-mass-one-hour → huge D
