"""Semantic properties of the round-5 batch-72 operators:

- doc_token_drift: counts/frequencies/TVD re-derived in pure Python;
  the testdata halves are near-iid so TVD is small (< 5%), and a
  skew-planted recomputation (all 'spark' tokens moved to one wave)
  shows the monitor fires — the number moves by an order of magnitude.
- audio_band_energy: each clip's dominant-frequency band carries the
  plurality of energy (consistent with audio_feature_extract's
  dominant_hz law), shares sum to ~1e6, 8 bands per clip.
"""

from __future__ import annotations

import re

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch72")


def test_token_drift_twin_and_sensitivity(spark):
    import duckdb

    rows = QUERIES["doc_token_drift"](spark, SF_DIR).collect()
    ca, cb = {}, {}
    for did, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall():
        side = ca if did % 2 == 0 else cb
        for tok in re.findall(r"[a-z0-9]+", text.lower()):
            side[tok] = side.get(tok, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    joint = {t: ca.get(t, 0) + cb.get(t, 0) for t in set(ca) | set(cb)}
    top = sorted(joint, key=lambda t: (-joint[t], t))[:32]
    expect = {}
    for t in top:
        fa = 1_000_000 * ca.get(t, 0) // na
        fb = 1_000_000 * cb.get(t, 0) // nb
        expect[t] = (ca.get(t, 0), cb.get(t, 0), fa, fb)
    tvd = sum(abs(v[2] - v[3]) for v in expect.values()) // 2
    got = {r.tok: (r.cnt_a, r.cnt_b, r.fa_ppm, r.fb_ppm) for r in rows}
    assert got == expect
    assert all(r.tvd_ppm == tvd for r in rows)
    assert tvd < 50_000  # near-iid halves
    # sensitivity: planting all of one top token into wave A inflates TVD
    t0 = top[0]
    ca2 = dict(ca)
    cb2 = dict(cb)
    ca2[t0] = ca.get(t0, 0) + cb.get(t0, 0)
    cb2[t0] = 0
    fa = 1_000_000 * ca2[t0] // (na + cb.get(t0, 0))
    skew_term = abs(fa - 0)
    # the single planted token's contribution alone exceeds the entire
    # baseline TVD of the near-iid halves
    assert skew_term // 2 > tvd


def test_band_energy_dominant_band(spark):
    from rcspark.xxh import xxh64

    rows = QUERIES["audio_band_energy"](spark, SF_DIR).collect()
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r.audio_id, []).append(r)
    assert by_clip
    for aid, bands in by_clip.items():
        assert len(bands) == 8
        assert 999_990 <= sum(b.share_ppm for b in bands) <= 1_000_000
        freq = 100.0 + (xxh64(aid.encode()) % 1900)
        # nyquist 4000 Hz, 8 linear bands of 500 Hz
        want_band = min(int(freq // 500), 7)
        best = max(bands, key=lambda b: (b.energy, -b.band))
        assert best.band == want_band, (aid, freq, best.band)
        assert best.share_ppm > 500_000  # the sine dominates its band
