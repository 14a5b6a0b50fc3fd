"""Planted-edge-case semantics for rcspark.middleware (batch 22):
meta-refresh classification + relative resolution, Referer policies
(downgrade suppression), nofollow gating, charset precedence. The driver
queries cross-check the same expressions against DuckDB at scale; these
tests pin the HAND-COMPUTED truth for the corners the fixtures encode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rcspark.middleware import (
    charset_cols,
    meta_refresh_cols,
    referer_value,
    resolve_url,
)


def _one(spark, cols: dict, **data):
    df = spark.createDataFrame([data])
    row = df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0]
    return row.asDict()


def test_resolve_url_forms(spark):
    df = spark.createDataFrame(
        [
            ("http://a.example/dir/page.html", "http://b.example/x", "abs"),
            ("http://a.example/dir/page.html", "//cdn.example/i.png", "proto"),
            ("https://a.example/dir/page.html", "/root.html", "root"),
            ("http://a.example/dir/page.html", "sub/next.html", "rel"),
        ],
        "base string, ref string, kind string",
    )
    got = {
        r["kind"]: r["out"]
        for r in df.select(
            "kind", resolve_url(F.col("base"), F.col("ref")).alias("out")
        ).collect()
    }
    assert got == {
        "abs": "http://b.example/x",
        "proto": "http://cdn.example/i.png",
        "root": "https://a.example/root.html",
        "rel": "http://a.example/dir/sub/next.html",
    }


def test_meta_refresh_classes(spark):
    cases = [
        ("<html></html>", "none", None, None),
        ('<meta http-equiv="refresh" content="0;url=/n">', "follow", 0,
         "http://h.example/n"),
        ('<meta http-equiv="refresh" content="5; URL=next.html">', "follow", 5,
         "http://h.example/d/next.html"),
        ('<meta http-equiv="refresh" content="101;url=/s">', "ignore", 101, None),
        ('<meta http-equiv="refresh" content="30">', "self", 30, None),
    ]
    df = spark.createDataFrame(
        [("http://h.example/d/p.html", b, a, i, t) for b, a, i, t in cases],
        "page string, body string, want_action string, want_secs int, want_target string",
    )
    mr = meta_refresh_cols(F.col("page"), F.col("body"))
    for r in df.select(
        "want_action", "want_secs", "want_target",
        mr["action"].alias("action"), mr["interval"].alias("secs"),
        mr["target"].alias("target"),
    ).collect():
        assert r["action"] == r["want_action"]
        assert r["secs"] == r["want_secs"]
        assert r["target"] == r["want_target"]


def test_referer_policies(spark):
    src = "https://a.example/p?x=1#frag"
    full = "https://a.example/p?x=1"
    origin = "https://a.example/"
    same = "https://a.example/other"
    cross = "https://b.example/t"
    down = "http://b.example/t"
    cases = [
        ("no-referrer", cross, None),
        ("no-referrer-when-downgrade", cross, full),
        ("no-referrer-when-downgrade", down, None),
        ("same-origin", same, full),
        ("same-origin", cross, None),
        ("origin", down, origin),
        ("strict-origin", cross, origin),
        ("strict-origin", down, None),
        ("origin-when-cross-origin", same, full),
        ("origin-when-cross-origin", cross, origin),
        ("strict-origin-when-cross-origin", same, full),
        ("strict-origin-when-cross-origin", cross, origin),
        ("strict-origin-when-cross-origin", down, None),
    ]
    df = spark.createDataFrame(
        [(p, src, d, w) for p, d, w in cases],
        "policy string, src string, dst string, want string",
    )
    for r in df.select(
        "policy", "want",
        referer_value(F.col("policy"), F.col("src"), F.col("dst")).alias("got"),
    ).collect():
        assert r["got"] == r["want"], (r["policy"], r["got"], r["want"])


def test_charset_precedence(spark):
    cases = [
        # BOM beats a conflicting header
        ("text/html; charset=ISO-8859-1", "\ufeff<html>", "utf-8", "bom"),
        # header beats meta
        ("text/html; charset=Latin-1",
         '<html><meta charset="utf-8">', "iso-8859-1", "header"),
        # meta beats xml decl position-wise (meta branch first)
        ("", '<html><meta charset="Shift_JIS">', "shift_jis", "meta"),
        # http-equiv form
        ("", '<meta http-equiv="Content-Type" content="text/html; charset=EUC-KR">',
         "euc-kr", "meta"),
        ("", '<?xml version="1.0" encoding="windows-1251"?>', "windows-1251",
         "xmldecl"),
        ("text/html", "<html>", "utf-8", "default"),
    ]
    df = spark.createDataFrame(
        cases, "header string, body string, want_enc string, want_src string"
    )
    cs = charset_cols(F.col("header"), F.col("body"))
    for r in df.select(
        "want_enc", "want_src",
        cs["encoding"].alias("enc"), cs["source"].alias("src"),
    ).collect():
        assert r["enc"] == r["want_enc"]
        assert r["src"] == r["want_src"]


def test_nofollow_gate_query(spark):
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_nofollow_gate"](spark, "/root/testdata/sf0.001").toPandas()
    # page-level nofollow hosts: every link suppressed
    page_nf = out[out.page_nofollow]
    assert len(page_nf) > 0 and not page_nf.followed.any()
    # rel=nofollow suppressed even on clean pages
    clean = out[~out.page_nofollow]
    assert not clean[clean.rel_nofollow].followed.any()
    assert clean[~clean.rel_nofollow].followed.all()
