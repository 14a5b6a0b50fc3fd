"""Semantic properties of the round-5 batch-67 operators:

- doc_dp_randomized_response: per-doc reports re-derived in Python
  (digest coin + flip rule), the debias identity holds exactly, and the
  estimate lands within the RR sampling envelope of the true count
  (|err| <= ~4·sqrt(n) for p=3/4).
- doc_rlhf_pair_format: digests re-derived from reconstructed
  serializations; the rejected completion is strictly shorter than
  chosen and ends with the tripled token (the repetition pathology).
"""

from __future__ import annotations

import math
import re

import pytest

from rcspark.datapipe.hashing import digest60_py
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch67")


def test_dp_rr_debias_and_envelope(spark):
    import duckdb

    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    n = len(texts)
    true_count = reported = 0
    for did, t in texts:
        bit = 1 if re.search(r"[0-9]{3}", t) else 0
        true_count += bit
        keep = digest60_py(f"rr:{did}") % 4 < 3
        reported += bit if keep else 1 - bit
    row = QUERIES["doc_dp_randomized_response"](spark, SF_DIR).collect()[0]
    assert (row.n, row.true_count, row.reported_count) == (
        n, true_count, reported,
    )
    est = (4 * reported - n) // 2
    assert row.dp_estimate == est
    assert row.abs_err == abs(est - true_count)
    # sampling envelope: var = n·p(1−p)/(2p−1)² = 3n/4·4 = 3n; 4σ bound
    assert row.abs_err <= 4 * math.sqrt(3 * n) + 2


def test_rlhf_pair_serializations(spark):
    import duckdb

    rows = QUERIES["doc_rlhf_pair_format"](spark, SF_DIR).collect()
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    assert rows
    for r in rows:
        toks = re.findall(r"[a-z0-9]+", texts[r.doc_id].lower())
        assert len(toks) >= 12 and r.n == len(toks)
        prompt = " ".join(toks[:8])
        ctoks = toks[8:]
        chosen = " ".join(ctoks)
        half = len(ctoks) // 2
        rejected = " ".join(ctoks[:half]) + 3 * (" " + ctoks[half - 1])
        assert r.prompt_digest == digest60_py(prompt)
        assert r.chosen_digest == digest60_py(chosen)
        assert r.rejected_digest == digest60_py(rejected), r.doc_id
        assert r.chosen_len == len(chosen)
        assert r.rejected_len == len(rejected)
        if r.n >= 24:  # tiny docs: the tripled tail can outweigh the cut
            assert r.rejected_len < r.chosen_len
        assert rejected.split()[-3:] == [ctoks[half - 1]] * 3
    assert sum(1 for r in rows if r.rejected_len < r.chosen_len) > 0.8 * len(
        rows
    )
