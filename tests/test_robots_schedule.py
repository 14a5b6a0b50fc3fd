"""Robots gate twin parity + scheduler correctness (SURVEY.md A5-A7)."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from rcspark.robots import apply_robots_gate, robots_allowed_py, robots_table
from rcspark.schedule import (
    assign_global_seq,
    order_cols,
    rank_within_budget,
    with_budget,
)


def test_robots_gate_matches_python_twin(spark):
    rng = random.Random(5)
    hosts = [f"h{i}.example" for i in range(6)]
    rules = []
    for h in hosts:
        allow = [f"/private/ok{i}" for i in range(rng.randint(0, 2))]
        deny = ["/private"] if rng.random() < 0.8 else ["/"]
        rules.append({"host": h, "allow_rules": allow, "deny_rules": deny, "crawl_delay": None})
    robots = robots_table(spark, pd.DataFrame(rules))
    paths = ["/", "/p/1", "/private/x", "/private/ok0", "/private/ok1/sub", "/privateer"]
    rows = [
        (h, p, f"http://{h}{p}") for h in hosts + ["unknown.example"] for p in paths
    ]
    df = spark.createDataFrame(rows, ["host", "path", "url_canon"])
    got = {
        (r.host, r.path): r.robots_allowed
        for r in apply_robots_gate(df, robots).collect()
    }
    by_host = {r["host"]: r for r in rules}
    for h, p, _ in rows:
        if h in by_host:
            want = robots_allowed_py(p, by_host[h]["allow_rules"], by_host[h]["deny_rules"])
        else:
            want = True  # no robots.txt → allowed
        assert got[(h, p)] == want, (h, p)


def _frontier(spark, n=2000, hosts=3):
    """Skewed frontier: host 0 dominates (zipf-ish)."""
    rows = []
    rng = random.Random(1)
    for i in range(n):
        h = 0 if rng.random() < 0.8 else rng.randint(1, hosts - 1)
        rows.append(
            (
                f"http://s{h}.example/p/{i}",
                rng.randint(-(2**40), 2**40),
                f"s{h}.example",
                f"/p/{i}",
                rng.randint(-2, 2),
                rng.randint(0, 5),
                rng.randint(0, 3),
                0,
                [None, 0.5, 1.0, 2.0][h % 4],
            )
        )
    return spark.createDataFrame(
        rows,
        "url_canon string, digest long, host string, path string, priority int, "
        "depth int, discovered_wave int, retry_count int, crawl_delay double",
    )


def test_salted_rank_equals_unsalted_reference(spark):
    fr = with_budget(_frontier(spark))
    scheduled, leftover = rank_within_budget(fr)
    # reference: plain single window per host
    w = Window.partitionBy("host").orderBy(*order_cols())
    ref = (
        fr.withColumn("j", F.row_number().over(w))
        .filter(F.col("j") <= F.col("budget"))
        .select("url_canon", "j")
    )
    got = {(r.url_canon, r.j) for r in scheduled.select("url_canon", "j").collect()}
    want = {(r.url_canon, r.j) for r in ref.collect()}
    assert got == want
    # conservation: scheduled + leftover = frontier
    assert scheduled.count() + leftover.count() == fr.count()


def test_assign_global_seq_contiguous_and_ordered(spark):
    fr = with_budget(_frontier(spark, n=500))
    scheduled, _ = rank_within_budget(fr)
    out = assign_global_seq(scheduled, [F.col("fetch_ms"), F.col("host")], seq_offset=100)
    rows = out.orderBy("seq").collect()
    assert [r.seq for r in rows] == list(range(100, 100 + len(rows)))
    keys = [(r.fetch_ms, r.host) for r in rows]
    assert keys == sorted(keys)


def test_budget_formula(spark):
    df = spark.createDataFrame(
        [(None,), (0.5,), (1.0,), (2.0,)], "crawl_delay double"
    )
    got = {
        (r.crawl_delay, r.delay_ms, r.budget)
        for r in with_budget(df).collect()
    }
    # WAVE_SECONDS=30, DOWNLOAD_DELAY=0.5, PER_HOST_CAP=64
    assert got == {(None, 500, 60), (0.5, 500, 60), (1.0, 1000, 30), (2.0, 2000, 15)}


# ---------------------------------------------------------------------------
# robots.txt TEXT parsing (rcspark.robots.parse_robots_txt)
# ---------------------------------------------------------------------------

def test_parse_robots_basic():
    from rcspark.robots import parse_robots_txt

    txt = """
# comment line
User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 2.5

User-agent: otherbot
Disallow: /
"""
    r = parse_robots_txt(txt)
    assert r["allow_rules"] == ["/private/ok"]
    assert r["deny_rules"] == ["/private"]
    assert r["crawl_delay"] == 2.5


def test_parse_robots_agent_precedence_and_empty_disallow():
    from rcspark.robots import parse_robots_txt

    txt = (
        "User-agent: a\nUser-agent: rcspark\nDisallow: /only-rc\n\n"
        "User-agent: *\nDisallow:\nDisallow: /all\nCrawl-delay: 1\n"
    )
    # exact-agent group wins over wildcard; multi-agent headers share rules
    r = parse_robots_txt(txt, agent="rcspark")
    assert r["deny_rules"] == ["/only-rc"] and r["crawl_delay"] is None
    # wildcard group: empty Disallow contributes no rule
    w = parse_robots_txt(txt, agent="someone-else")
    assert w["deny_rules"] == ["/all"] and w["crawl_delay"] == 1.0


def test_parse_robots_garbage_golden_vectors():
    """Malformed-line golden vectors (VERDICT r2 next-round #6): garbage
    through the parser's skip paths must never silently drop a valid
    group or the rules that follow it."""
    from rcspark.robots import parse_robots_txt

    # UTF-8 BOM glued to the first directive must not kill the group
    r = parse_robots_txt("﻿User-agent: *\nDisallow: /x\n")
    assert r["deny_rules"] == ["/x"]

    # truncated directive (no colon), bare colon, unknown keys: all ignored,
    # rules on following lines still land in the open group
    txt = (
        "User-agent: *\n"
        "Disallow\n"              # truncated: no colon
        ":\n"                     # bare colon
        "Sitemap: https://e.test/s.xml\n"  # unknown directive
        "garbage-key: value\n"
        "Disallow: /kept\n"
        "Crawl-delay: fast\n"     # malformed number: directive ignored
        "Crawl-delay: 3\n"
    )
    r = parse_robots_txt(txt)
    assert r["deny_rules"] == ["/kept"]
    assert r["crawl_delay"] == 3.0

    # unknown directives between User-agent lines must NOT split the run
    # into two groups (RFC 9309: only rule lines end agent accumulation)
    txt = "User-agent: a\nSitemap: s\nUser-agent: b\nDisallow: /both\n"
    assert parse_robots_txt(txt, agent="a")["deny_rules"] == ["/both"]
    assert parse_robots_txt(txt, agent="b")["deny_rules"] == ["/both"]

    # rules before any User-agent line attach to no group; later valid
    # group still parses
    txt = "Disallow: /orphan\nUser-agent: *\nDisallow: /real\n"
    assert parse_robots_txt(txt)["deny_rules"] == ["/real"]


def test_wildcard_rules_spark_matches_python_twin(spark):
    """Gate with protego wildcard dialect: '*' and trailing '$' — the
    Spark SQL match expression and robots_allowed_py must agree on every
    (path, ruleset) combination, including regex metachars in paths."""
    from rcspark.robots import apply_robots_gate, robots_allowed_py
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rulesets = [
        (["/p/*/img"], ["/p"]),             # allow wildcard vs deny prefix
        ([], ["/*.json$"]),                 # deny by extension anchor
        (["/a$"], ["/a"]),                  # exact-path allow vs prefix deny
        ([], ["/dir/*"]),                   # wildcard deny
        (["/d.x/*"], ["/d"]),               # dot in rule must stay literal
    ]
    paths = [
        "/p/42/img", "/p/42/img/x", "/p/42/thumb", "/data/f.json",
        "/data/f_json", "/a", "/ab", "/dir/", "/dir/x", "/dir",
        "/d.x/1", "/dqx/1", "/dyx/1",
    ]
    rows = []
    for i, (allow, deny) in enumerate(rulesets):
        for p in paths:
            rows.append((f"h{i}", p, allow, deny))
    df = spark.createDataFrame(
        rows, "host string, path string, allow_rules array<string>, deny_rules array<string>"
    )
    robots = df.select("host", "allow_rules", "deny_rules").distinct().withColumn(
        "crawl_delay", F.lit(None).cast("double")
    )
    got = {
        (r["host"], r["path"]): r["robots_allowed"]
        for r in apply_robots_gate(df.select("host", "path"), robots).collect()
    }
    for i, (allow, deny) in enumerate(rulesets):
        for p in paths:
            want = robots_allowed_py(p, allow, deny)
            assert got[(f"h{i}", p)] == want, (i, p, allow, deny, want)
