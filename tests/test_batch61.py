"""Semantic properties of the round-5 batch-61 operators:

- crawl_retry_backoff: only retryable statuses below the cap get a
  schedule; jitter < base (full-jitter window); backoff = base + jitter;
  decorrelation is real — same (status, retry_count) cohorts spread over
  the window instead of resynchronizing (distinct jitters >> 1), and the
  jitter matches the documented digest law per row.
- doc_instruction_format: for every ok row the reconstructed template
  string's digest matches fmt_digest, the mask span points exactly at
  the response substring, and no-split docs are flagged with NULL spans.
"""

from __future__ import annotations

import pytest

from rcspark.datapipe.hashing import digest60_py
from rcspark.queries import _SFT_ASST, _SFT_END, _SFT_SYS, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch61")


def test_retry_backoff_jitter_law(spark):
    rows = QUERIES["crawl_retry_backoff"](spark, SF_DIR).collect()
    assert rows
    jitters_by_cohort = {}
    for r in rows:
        assert r.status == 503  # only the retryable fixture status
        assert r.retry_count < 3
        assert r.base_ms == 1000 * (1 << r.retry_count)
        assert 0 <= r.jitter_ms < r.base_ms
        assert r.backoff_ms == r.base_ms + r.jitter_ms
        expect = digest60_py(f"rj:{r.event_id}:{r.retry_count + 1}") % r.base_ms
        assert r.jitter_ms == expect
        jitters_by_cohort.setdefault(r.retry_count, set()).add(r.jitter_ms)
    # decorrelation: a cohort that would herd at one instant spreads out
    for rc, js in jitters_by_cohort.items():
        if rc >= 1:  # window >= 2000 ms
            assert len(js) > 5, (rc, js)


def test_instruction_format_span_and_digest(spark):
    import duckdb

    rows = QUERIES["doc_instruction_format"](spark, SF_DIR).collect()
    texts = {}
    for did, t in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall():
        texts[str(did)] = t
        if did % 4 == 0:
            texts[f"sft:{did}"] = f"Explain entry {did}. " + t[:80]
    n_ok = 0
    for r in rows:
        t = texts[r.doc_id]
        cuts = [i for i in (t.find("."), t.find("!"), t.find("?")) if i >= 0]
        if not cuts:
            assert not r.ok and r.mask_start is None
            continue
        cut = min(cuts) + 1  # 1-based inclusive
        prompt, response = t[:cut], t[cut:].lstrip(" ")
        if not response:
            assert not r.ok
            continue
        n_ok += 1
        assert r.ok
        fmt = _SFT_SYS + prompt + _SFT_ASST + response + _SFT_END
        assert r.fmt_digest == digest60_py(fmt)
        # the mask span extracts exactly the response from the template
        assert fmt[r.mask_start - 1 : r.mask_start - 1 + r.mask_len] == response
        assert r.prompt_len == len(prompt)
    assert n_ok > 0  # every 'sft:' plant splits
    assert any(not r.ok for r in rows)  # reals exercise the no-split flag
