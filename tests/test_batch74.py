"""Semantic properties of the round-5 batch-74 operators:

- crawl_mime_mismatch_gate: the verdict table follows the trust-bytes
  rule (octet-stream upgrades, concrete disagreements quarantine, only
  true matches 'ok'), re-derived per key; all three verdicts occur.
- events_token_bucket: the per-user fold re-derived step-by-step in
  Python; bucket invariants (0 <= tokens <= capacity, admitted+rejected
  = n, burst-then-starve behavior: admissions never exceed
  capacity + elapsed/2s + 1).
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch74")


def test_mime_gate_rule(spark):
    rows = QUERIES["crawl_mime_mismatch_gate"](spark, SF_DIR).collect()
    verdicts = set()
    for r in rows:
        k = r.p_partkey
        declared = ["image/png", "image/jpeg", "text/html",
                    "application/octet-stream"][k % 4]
        sniffed = ["image/png", "image/jpeg", "text/html"][k % 3]
        assert (r.declared, r.sniffed) == (declared, sniffed)
        assert r.mismatch == (declared != sniffed)
        if declared == sniffed:
            assert r.verdict == "ok"
        elif declared == "application/octet-stream":
            assert r.verdict == "sniff_upgrade"
        else:
            assert r.verdict == "quarantine"
        verdicts.add(r.verdict)
    assert verdicts == {"ok", "sniff_upgrade", "quarantine"}


def test_token_bucket_python_fold(spark):
    import duckdb

    rows = {r.user_id: r for r in QUERIES["events_token_bucket"](spark, SF_DIR).collect()}
    series = {}
    base_ms = 1704067200000 - 3600000
    for uid, eid, ts in duckdb.sql(
        f"SELECT user_id, event_id, ts FROM '{SF_DIR}/events.parquet'"
    ).fetchall():
        import calendar

        ms = calendar.timegm(ts.timetuple()) * 1000 + ts.microsecond // 1000
        series.setdefault(uid, []).append((ms, eid))
    for uid in list(series):
        for j in range(1, 9):
            series[uid].append((base_ms + uid, 1000000000 + uid * 10 + j))
    for uid, evs in series.items():
        evs.sort()
        mss = [m for m, _ in evs]
        tokens, adm, last = 4000, 1, mss[0]
        for m in mss[1:]:
            t = min(5000, tokens + (m - last) // 2)
            if t >= 1000:
                tokens = t - 1000
                adm += 1
            else:
                tokens = t
            last = m
        r = rows[uid]
        assert r.n_events == len(mss)
        assert r.n_admitted == adm, uid
        assert r.n_rejected == len(mss) - adm
        assert r.final_tokens_milli == tokens
        assert 0 <= tokens <= 5000
        # rate law: admissions bounded by capacity + refill over the span
        span_tokens = 5 + (mss[-1] - mss[0]) // 2000 + 1
        assert adm <= span_tokens
    # the planted same-ms burst from a full bucket: 5 admitted, 3
    # rejected — every user rejects exactly 3
    assert all(r.n_rejected == 3 for r in rows.values())
