"""Batch-36 properties: the chi-square recomputed from raw events (all 24
cells, zeros included), peak/trough tie rules, and the Zipf readout laws."""

from collections import Counter

import pytest

from rcspark.queries import _ZIPF_TOPK, CHI2_SEASONAL_MILLI, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch36")


def test_hourly_seasonality_recompute(spark):
    rows = {r.event_type: r for r in
            QUERIES["events_hourly_seasonality"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "ts").collect()
    counts: dict[str, Counter] = {}
    for e in ev:
        counts.setdefault(e.event_type, Counter())[e.ts.hour] += 1
    assert set(rows) == set(counts)
    for et, c in counts.items():
        r = rows[et]
        total = sum(c.values())
        exp = total // 24
        chi2 = sum(((c.get(h, 0) - exp) ** 2 * 1000) // max(exp, 1)
                   for h in range(24))
        assert (r.total, r.expected, r.chi2_milli) == (total, exp, chi2)
        assert r.peak_hour == min(
            range(24), key=lambda h: (-c.get(h, 0), h))
        assert r.trough_hour == min(
            range(24), key=lambda h: (c.get(h, 0), h))
        assert r.is_seasonal == (chi2 > CHI2_SEASONAL_MILLI)


def test_zipf_rank_freq_laws(spark):
    rows = sorted(QUERIES["doc_zipf_rank_freq"](spark, SF_DIR).collect(),
                  key=lambda r: r.rank)
    assert rows and [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= _ZIPF_TOPK
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    f1 = rows[0].freq
    assert rows[0].rf_ratio_ppm == 1_000_000
    for r in rows:
        assert r.rank_x_freq == r.rank * r.freq
        assert r.rf_ratio_ppm == 1_000_000 * r.rank * r.freq // f1
