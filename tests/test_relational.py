"""Semantic contracts for rcspark.relational (round-3 Table B extensions):
as-of join vs pandas merge_asof, PageRank invariants, sitemap edge cases.
The cross-engine value checks live in the driver contract
(join_asof_events / crawl_host_pagerank / crawl_sitemap_extract oracles)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from rcspark.relational import (
    PAGERANK_SCALE,
    asof_join,
    pagerank_hosts,
    sitemap_entries,
)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Constructed case with inclusive-boundary hits, same-timestamp quote
    ties, probes before any quote, and keys with no quotes at all."""
    quotes = [
        # (k, t, qid, val)
        (1, 10, 100, 7), (1, 10, 101, 8),   # tie at t=10 → max qid wins
        (1, 20, 102, 9),
        (2, 15, 200, 3),
    ]
    probes = [
        # (k, t, pid)
        (1, 5, 0),    # before any quote → NULL
        (1, 10, 1),   # inclusive boundary → qid 101
        (1, 15, 2),   # between → qid 101
        (1, 25, 3),   # after last → qid 102
        (2, 15, 4),   # inclusive on key 2 → qid 200
        (3, 50, 5),   # key with no quotes → NULL
    ]
    qdf = spark.createDataFrame(quotes, "k int, t int, qid int, val int")
    pdf = spark.createDataFrame(probes, "k int, t int, pid int")
    out = asof_join(
        pdf, qdf, key="k", probe_ts="t", quote_ts="t",
        value_cols=["qid", "val"], tie_col="qid",
    )
    got = {r["pid"]: (r["qid"], r["val"]) for r in out.collect()}
    assert got == {
        0: (None, None), 1: (101, 8), 2: (101, 8),
        3: (102, 9), 4: (200, 3), 5: (None, None),
    }
    # cross-check the non-tie rows against pandas merge_asof semantics
    qp = pd.DataFrame(quotes, columns=["k", "t", "qid", "val"]).sort_values(["t", "qid"])
    pp = pd.DataFrame(probes, columns=["k", "t", "pid"]).sort_values("t")
    merged = pd.merge_asof(pp, qp, on="t", by="k", direction="backward")
    for _, row in merged.iterrows():
        if row["pid"] in (1, 2):  # merge_asof keeps the LAST sorted tie — same rule
            assert got[row["pid"]][0] == row["qid"]


def test_asof_join_null_value_stays_on_winning_row(spark):
    """Row-wise merge_asof semantics (ADVICE r3): a NULL value column on
    the winning quote must arrive as NULL — never backfilled from an
    earlier quote — and all value columns must come from the SAME row."""
    quotes = [
        (1, 10, 100, 7, 70),      # older quote: both values set
        (1, 20, 101, None, 71),   # winner at t>=20: val is NULL
    ]
    probes = [(1, 15, 0), (1, 25, 1)]
    qdf = spark.createDataFrame(quotes, "k int, t int, qid int, val int, v2 int")
    pdf = spark.createDataFrame(probes, "k int, t int, pid int")
    out = asof_join(
        pdf, qdf, key="k", probe_ts="t", quote_ts="t",
        value_cols=["qid", "val", "v2"], tie_col="qid",
    )
    got = {r["pid"]: (r["qid"], r["val"], r["v2"]) for r in out.collect()}
    assert got == {0: (100, 7, 70), 1: (101, None, 71)}, got
    # pandas merge_asof agrees: the t=25 probe takes row qid=101 wholesale
    qp = pd.DataFrame(quotes, columns=["k", "t", "qid", "val", "v2"]).sort_values("t")
    pp = pd.DataFrame(probes, columns=["k", "t", "pid"]).sort_values("t")
    merged = pd.merge_asof(pp, qp, on="t", by="k", direction="backward")
    row = merged[merged["pid"] == 1].iloc[0]
    assert row["qid"] == 101 and pd.isna(row["val"]) and row["v2"] == 71


def test_asof_join_one_exchange(spark):
    """The plan must contain exactly one Exchange for the union+window —
    no range-join blowup, no broadcast requirement."""
    qdf = spark.createDataFrame([(1, 1, 1)], "k int, t int, qid int")
    pdf = spark.createDataFrame([(1, 2, 0)], "k int, t int, pid int")
    out = asof_join(pdf, qdf, "k", "t", "t", ["qid"], "qid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pagerank_invariants(spark):
    """On a 3-cycle every node keeps rank exactly scale (the stationary
    point); a hub-and-spoke graph ranks the sink strictly highest; a
    dangling sink leaks mass but stays ordered."""
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    ranks = {r["host"]: r["rank"] for r in pagerank_hosts(cyc, iters=4).collect()}
    assert ranks == {"a": PAGERANK_SCALE, "b": PAGERANK_SCALE, "c": PAGERANK_SCALE}

    star = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        "src string, dst string",
    )
    r = {x["host"]: x["rank"] for x in pagerank_hosts(star, iters=3).collect()}
    assert r["hub"] > max(r["s1"], r["s2"], r["s3"])
    assert r["s1"] > r["s2"] == r["s3"]  # s1 gets the hub's mass back


def test_sitemap_entries_edges(spark):
    """Empty bodies yield no rows; entries keep document order via seq;
    a lastmod-less tail entry pads NULL instead of mis-zipping."""
    pages = spark.createDataFrame(
        [
            ("h0", "<urlset></urlset>"),
            ("h1", "<urlset><url><loc>u1</loc><lastmod>d1</lastmod></url>"
                   "<url><loc>u2</loc><lastmod>d2</lastmod></url></urlset>"),
            ("h2", "<urlset><url><loc>u3</loc><lastmod>d3</lastmod></url>"
                   "<url><loc>u4</loc></url></urlset>"),
        ],
        "host string, body string",
    )
    rows = sorted(
        (r["host"], r["seq"], r["loc"], r["lastmod"])
        for r in sitemap_entries(pages).collect()
    )
    assert rows == [
        ("h1", 1, "u1", "d1"), ("h1", 2, "u2", "d2"),
        ("h2", 1, "u3", "d3"), ("h2", 2, "u4", None),
    ]


def test_interval_join_boundaries_and_buckets(spark):
    """Edge semantics: inclusive start, exclusive end, key isolation, and
    intervals spanning multiple buckets (bucket_seconds smaller than the
    interval) — pruning must never drop a true pair."""
    from rcspark.relational import interval_join

    points = spark.createDataFrame(
        [
            (0, 1, "2024-01-02 00:00:00"),  # == start → IN
            (1, 1, "2024-01-04 23:59:59"),  # just inside → IN
            (2, 1, "2024-01-05 00:00:00"),  # == end → OUT
            (3, 2, "2024-01-03 12:00:00"),  # right time, other key → OUT
            (4, 1, "2024-01-01 23:59:59"),  # before start → OUT
        ],
        "pid int, k int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    intervals = spark.createDataFrame(
        [(100, 1, "2024-01-02 00:00:00", "2024-01-05 00:00:00")],
        "iid int, k int, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))

    for bucket in (3600, 86_400, 7 * 86_400):  # interval spans 72/3/1 buckets
        got = sorted(
            r["pid"]
            for r in interval_join(
                points, intervals, "ts", "s", "e", keys=["k"], bucket_seconds=bucket
            ).collect()
        )
        assert got == [0, 1], bucket


def test_connected_components_matches_union_find(spark):
    """Min-label propagation vs a Python union-find on a constructed graph
    with a chain (diameter > 1), a clique, a singleton, and an isolated
    pair; also pins convergence (iters vs iters+1 labels identical) so the
    fixed CC_ITERS in the driver query is known-sufficient shape-wise."""
    from rcspark.relational import CC_ITERS, connected_components

    edges = [
        (1, 2), (2, 3), (3, 4),      # chain of 4 → component min 1
        (10, 11), (11, 12), (10, 12),  # clique
        (20, 21),                    # pair
    ]
    nodes = sorted({n for e in edges for n in e} | {99})  # 99 = singleton
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    want = {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}

    got = {
        r["node"]: r["cluster"]
        for r in connected_components(ndf, edf, iters=CC_ITERS).collect()
    }
    assert got == want
    got_plus = {
        r["node"]: r["cluster"]
        for r in connected_components(ndf, edf, iters=CC_ITERS + 1).collect()
    }
    assert got_plus == got
    spark.catalog.clearCache()


def test_dedup_clusters_verdict_invariants(spark):
    """doc_dedup_clusters on sf0.001: every doc labeled exactly once,
    exactly one keep per cluster (the min doc_id), csize consistent, and
    every verified jaccard>=0.5 pair lands in the same cluster."""
    from rcspark.queries import QUERIES

    out = QUERIES["doc_dedup_clusters"](spark, "/root/testdata/sf0.001").toPandas()
    spark.catalog.clearCache()
    ndocs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet").shape[0]
    assert len(out) == ndocs and out["doc_id"].is_unique
    g = out.groupby("cluster")
    assert (g["keep"].sum() == 1).all()
    assert (g["csize"].nunique() == 1).all()
    assert (g.size().values == g["csize"].first().values).all()
    keepers = out[out["keep"] == 1].set_index("cluster")["doc_id"]
    assert (keepers.values == g["doc_id"].min().loc[keepers.index].values).all()


def test_anchor_pairs_edges(spark):
    """Anchorless bodies yield no rows; seq preserves document order;
    extra columns ride along; anchors with empty text still pair."""
    from pyspark.sql import functions as F

    from rcspark.relational import anchor_pairs

    pages = spark.createDataFrame(
        [
            ("h0", 7, "<html>no links here</html>"),
            ("h1", 8, '<html><a href="u1">One</a><p>x</p><a href="u2">Two</a></html>'),
            ("h2", 9, '<html><a href="u3"></a></html>'),
        ],
        "host string, wave int, body string",
    )
    rows = sorted(
        (r["host"], r["wave"], r["seq"], r["href"], r["anchor"])
        for r in anchor_pairs(pages).collect()
    )
    assert rows == [
        ("h1", 8, 1, "u1", "One"),
        ("h1", 8, 2, "u2", "Two"),
        ("h2", 9, 1, "u3", ""),
    ]
