"""Streaming-mode tests: cross-batch state continuity of the politeness
slot clock (rcspark.streaming.politeness_slots).

Two parquet files fed through maxFilesPerTrigger=1 produce two
micro-batches; the per-host GroupState counter must continue numbering in
batch 2 where batch 1 stopped — that is the property that makes the
streaming mode a faithful continuous version of the batch A5/A6 scheduler.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from rcspark.streaming import politeness_slots, stream_available_now


@pytest.fixture()
def two_batch_dir(tmp_path):
    # batch 1: hosts a(3 rows), b(1); batch 2: a(2), b(2)
    b1 = pd.DataFrame(
        {"host": ["a", "a", "a", "b"], "event_id": [3, 1, 2, 10], "delay_ms": [500] * 4}
    )
    b2 = pd.DataFrame(
        {"host": ["a", "a", "b", "b"], "event_id": [5, 4, 12, 11], "delay_ms": [500] * 4}
    )
    p1, p2 = str(tmp_path / "batch1.parquet"), str(tmp_path / "batch2.parquet")
    b1.to_parquet(p1)
    b2.to_parquet(p2)
    # FileStreamSource orders candidate files by modification time: make
    # batch1 strictly older so the two-trigger order is deterministic
    now = time.time()
    os.utime(p1, (now - 60, now - 60))
    os.utime(p2, (now, now))
    return str(tmp_path)


def test_state_continues_across_batches(spark, two_batch_dir):
    src = (
        spark.readStream.schema("host string, event_id long, delay_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_dir)
    )
    out = stream_available_now(politeness_slots(src), spark)
    rows = {(r["host"], r["event_id"]): (r["j"], r["fetch_ms"]) for r in out.collect()}

    # batch 1: within-batch sort by event_id, j from 1
    assert rows[("a", 1)] == (1, 0)
    assert rows[("a", 2)] == (2, 500)
    assert rows[("a", 3)] == (3, 1000)
    assert rows[("b", 10)] == (1, 0)
    # batch 2: host counters CONTINUE (a at 4, b at 2) — the GroupState
    assert rows[("a", 4)] == (4, 1500)
    assert rows[("a", 5)] == (5, 2000)
    assert rows[("b", 11)] == (2, 500)
    assert rows[("b", 12)] == (3, 1000)
