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


def test_slots_correct_when_host_spans_arrow_chunks(spark, tmp_path):
    """Regression (ADVICE r1 high): with maxRecordsPerBatch=10, one host's
    100 reverse-ordered events arrive as ~10 Arrow chunks inside a single
    micro-batch.  Sorting each chunk independently assigned j out of
    event_id order (event_id 1 got j=91); the operator must drain and
    concatenate the per-group iterator before numbering."""
    pd.DataFrame(
        {
            "host": ["a"] * 100,
            "event_id": list(range(100, 0, -1)),
            "delay_ms": [500] * 100,
        }
    ).to_parquet(str(tmp_path / "b1.parquet"))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        src = (
            spark.readStream.schema("host string, event_id long, delay_ms long")
            .parquet(str(tmp_path))
        )
        out = stream_available_now(politeness_slots(src), spark)
        rows = {r["event_id"]: (r["j"], r["fetch_ms"]) for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(rows) == 100
    for eid in range(1, 101):
        assert rows[eid] == (eid, (eid - 1) * 500), (eid, rows[eid])


@pytest.mark.parametrize("seed", [19, 11])
def test_stream_crawl_loop_matches_bsp_engine(spark, tmp_path, seed):
    """CLOSED-LOOP streaming crawl vs the BSP wave engine on the same
    fixture web (VERDICT r1 next-round #5): fetch/parse discoveries feed
    back into the stream source; final URL-seen SET and the
    (url, result, retry_count) fetch-attempt multiset must be EQUAL —
    membership is closure-determined, scheduling order only permutes
    discovery. Seed 19 exercises every outcome class (fetched, retry,
    redirect, failed, robots_denied); seed 11 is a second web shape."""
    import tempfile

    from pyspark.sql import functions as F

    from rcspark.fixtures import make_fixture
    from rcspark.run import CrawlEngine
    from rcspark.streaming import stream_crawl_loop

    fx = make_fixture(n_hosts=5, urls_per_host=25, seed=seed)
    web = spark.createDataFrame(fx.web).persist()
    web.count()
    eng = CrawlEngine(
        spark, str(tmp_path / "bsp"), web, spark.createDataFrame(fx.corpus),
        fx.robots, fx.seeds, fx.allowed_hosts,
    )
    eng.run()
    bsp_seen = {r.url_canon for r in eng.seen_table().collect()}
    bsp_log = sorted(
        (r.url_canon, r.result, r.retry_count) for r in eng.fetch_log().collect()
    )

    out = stream_crawl_loop(
        spark, web, fx.robots, fx.seeds, fx.allowed_hosts, str(tmp_path / "loop")
    )
    st_seen = {
        r.url_canon
        for r in out["scheduled"].filter(F.col("retry_count") == 0).collect()
    }
    st_log = sorted(
        (r.url_canon, r.result, r.retry_count) for r in out["fetch_log"].collect()
    )
    web.unpersist()
    assert st_seen == bsp_seen
    assert st_log == bsp_log
    if seed == 19:
        assert {r[1] for r in bsp_log} == {
            "fetched", "retry", "redirect", "failed", "robots_denied"
        }


def test_stream_crawl_loop_kill_resume_exactness(spark, tmp_path):
    """A19 for continuous mode: a loop killed between rounds (max_rounds=2)
    and re-invoked on the same workdir must converge to the same final
    scheduled set AND the same per-host slot clocks (j / fetch_ms) as an
    uninterrupted run — the stream checkpoint carries the seen set, the
    slot GroupState, and the processed-file log across invocations."""
    from pyspark.sql import functions as F

    from rcspark.fixtures import make_fixture
    from rcspark.streaming import stream_crawl_loop

    fx = make_fixture(n_hosts=3, urls_per_host=10, seed=3)
    web = spark.createDataFrame(fx.web).persist()
    web.count()

    full = stream_crawl_loop(
        spark, web, fx.robots, fx.seeds, fx.allowed_hosts, str(tmp_path / "full")
    )
    interrupted_dir = str(tmp_path / "interrupted")
    stream_crawl_loop(
        spark, web, fx.robots, fx.seeds, fx.allowed_hosts, interrupted_dir,
        max_rounds=2,
    )
    resumed = stream_crawl_loop(
        spark, web, fx.robots, fx.seeds, fx.allowed_hosts, interrupted_dir
    )
    web.unpersist()

    def snap(out):
        return sorted(
            (r.url_canon, r.retry_count, r.host, r.j, r.fetch_ms)
            for r in out["scheduled"].collect()
        )

    def logsnap(out):
        return sorted(
            (r.url_canon, r.result, r.retry_count)
            for r in out["fetch_log"].collect()
        )

    assert snap(resumed) == snap(full)
    assert logsnap(resumed) == logsnap(full)


def test_continuous_frontier_pipeline_resume_and_dedup(spark, tmp_path):
    """Two invocations of the continuous pipeline over a growing input dir:
    the second run must (a) skip files already processed (checkpoint),
    (b) drop URLs whose digest was seen in the FIRST run (state-store
    dedup), and (c) continue per-host slot clocks."""
    import pandas as pd

    from rcspark.streaming import continuous_frontier_pipeline

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(in_dir)

    # batch 1: three URLs on host a (one is a noisy duplicate), one on b
    pd.DataFrame(
        {
            "url": [
                "HTTP://A.example:80/p/1?utm_source=x",
                "http://a.example/p/2",
                "http://a.example/p/1",  # canon-dup of the first
                "http://b.example/p/1",
            ],
            "seq": [0, 1, 2, 3],
        }
    ).to_parquet(os.path.join(in_dir, "b1.parquet"))
    continuous_frontier_pipeline(spark, in_dir, out_dir, ckpt)
    out1 = {r["url_canon"]: r for r in spark.read.parquet(out_dir).collect()}
    assert set(out1) == {
        "http://a.example/p/1",
        "http://a.example/p/2",
        "http://b.example/p/1",
    }
    assert {out1["http://a.example/p/1"]["j"], out1["http://a.example/p/2"]["j"]} == {1, 2}
    assert out1["http://b.example/p/1"]["j"] == 1

    # batch 2: a cross-RUN duplicate, plus two genuinely new URLs
    pd.DataFrame(
        {
            "url": [
                "http://a.example/p/2#frag",  # seen in run 1 -> must drop
                "http://a.example/p/9",
                "http://b.example/p/7",
            ],
            "seq": [10, 11, 12],
        }
    ).to_parquet(os.path.join(in_dir, "b2.parquet"))
    continuous_frontier_pipeline(spark, in_dir, out_dir, ckpt)
    out2 = spark.read.parquet(out_dir).collect()
    by_url = {r["url_canon"]: r for r in out2}
    assert len(out2) == 5  # 3 from run 1 + 2 new (cross-run dup dropped)
    # slot clocks CONTINUED across runs: host a had 2 fetches -> next j=3
    assert by_url["http://a.example/p/9"]["j"] == 3
    assert by_url["http://a.example/p/9"]["fetch_ms"] == 1000
    assert by_url["http://b.example/p/7"]["j"] == 2
