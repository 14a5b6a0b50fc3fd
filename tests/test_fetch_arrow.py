"""A10 real-fetch path: mapInPandas batched transport fetcher must produce
the same outcome rows as the sandbox's simulate_fetch join for the same
web, and pace per-host schedules when asked."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from rcspark.fetch import classify_outcome, fetch_http_arrow, simulate_fetch


@pytest.fixture(scope="module")
def world(spark):
    web_rows = [
        ("http://a.example/1", 200, None, b"<title>one</title>"),
        ("http://a.example/2", 503, None, b""),
        ("http://a.example/3", 301, "http://a.example/1", b""),
        ("http://b.example/1", 200, None, b"<title>bee</title>"),
    ]
    web = spark.createDataFrame(
        web_rows, "url_canon string, status int, redirect_to string, body binary"
    )
    sched_rows = [
        ("http://a.example/1", "a.example", 0, 0),
        ("http://a.example/2", "a.example", 500, 0),
        ("http://a.example/3", "a.example", 1000, 0),
        ("http://b.example/1", "b.example", 0, 0),
        ("http://a.example/missing", "a.example", 1500, 0),
    ]
    sched = spark.createDataFrame(
        sched_rows, "url_canon string, host string, fetch_ms long, retry_count int"
    ).withColumn("priority", F.lit(0)).withColumn("depth", F.lit(0))
    lookup = {r[0]: (r[1], r[2], r[3]) for r in web_rows}
    return web, sched, lookup


def _transport_from(lookup):
    def transport(url):
        hit = lookup.get(url)
        return hit if hit is not None else (None, None, None)

    return transport


def test_transport_fetch_matches_join_fetch(spark, world):
    web, sched, lookup = world
    via_join = classify_outcome(simulate_fetch(sched, web))
    via_transport = classify_outcome(
        fetch_http_arrow(sched, _transport_from(lookup))
    )
    key = lambda r: (r["url_canon"], r["status"], r["redirect_to"],
                     bytes(r["body"]) if r["body"] is not None else None, r["result"])
    a = sorted(key(r) for r in via_join.collect())
    b = sorted(key(r) for r in via_transport.collect())
    assert a == b
    results = {r["url_canon"]: r["result"] for r in via_transport.collect()}
    assert results["http://a.example/1"] == "fetched"
    assert results["http://a.example/2"] == "retry"
    assert results["http://a.example/3"] == "redirect"
    assert results["http://a.example/missing"] == "failed"


def test_pacing_honors_schedule(spark, world):
    _, sched, lookup = world
    a_only = sched.filter(F.col("host") == "a.example")
    t0 = time.time()
    fetch_http_arrow(a_only, _transport_from(lookup), pace=True).collect()
    elapsed = time.time() - t0
    # last slot for host a is fetch_ms=1500 → the batch cannot finish faster
    assert elapsed >= 1.5
