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


def test_decode_body_variants_and_bomb():
    import gzip
    import zlib

    import pytest

    from rcspark.middleware import decode_body

    pt = b"the quick brown fox " * 20
    assert decode_body(gzip.compress(pt), "gzip", 4096) == (pt, False)
    assert decode_body(zlib.compress(pt), "deflate", 4096) == (pt, False)
    co = zlib.compressobj(wbits=-15)
    assert decode_body(co.compress(pt) + co.flush(), "deflate", 4096) == (pt, False)
    assert decode_body(pt, "identity", 4096) == (pt, False)
    big = b"z" * 50_000
    out, bomb = decode_body(gzip.compress(big), "gzip", 4096)
    assert bomb and out == big[:4096]
    out, bomb = decode_body(big, "identity", 4096)
    assert bomb and out == big[:4096]
    # exact boundary is NOT a bomb
    exact = b"e" * 4096
    assert decode_body(gzip.compress(exact), "gzip", 4096) == (exact, False)
    with pytest.raises(ValueError):
        decode_body(b"xx", "br", 4096)


def test_spec_warehouse_prunes_by_each_waves_own_spec(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from rcspark.tables import SpecWarehouse

    rows = [(i, i % 3, f"h{i % 4}") for i in range(120)]
    df = spark.createDataFrame(rows, "k long, shard int, host string")
    wh = SpecWarehouse(spark, str(tmp_path / "wh"))
    wh.write_wave_spec("t", df.filter("k < 60"), 0, ["shard"])
    wh.write_wave_spec("t", df.filter("k >= 60"), 1, ["shard", "host"])
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("shard", T.IntegerType(), True),
            T.StructField("host", T.StringType(), True),
        ]
    )
    # v1 wave: host not in spec -> every shard dir scanned, residual filter
    d0, n0 = wh.read_wave_pruned("t", 0, schema, {"host": "h2"})
    assert n0 == 3
    got0 = {r["k"] for r in d0.collect()}
    assert got0 == {i for i in range(60) if i % 4 == 2}
    # v2 wave: host in spec -> only host=h2 leaves under each shard
    d1, n1 = wh.read_wave_pruned("t", 1, schema, {"host": "h2"})
    assert n1 == 3  # one h2 leaf per shard dir
    got1 = {r["k"] for r in d1.collect()}
    assert got1 == {i for i in range(60, 120) if i % 4 == 2}
    # fully-pruned value: zero dirs, empty frame
    d2, n2 = wh.read_wave_pruned("t", 1, schema, {"host": "h9"})
    assert n2 == 0 and d2.count() == 0
    # spec sidecars readable
    assert wh.wave_spec("t", 0) == ["shard"]
    assert wh.wave_spec("t", 1) == ["shard", "host"]


def test_tile_phash_watermark_signal():
    from rcspark.codecs import phash64
    from rcspark.datapipe.multimodal import quadrant_phashes
    from rcspark.fixtures import make_smooth_image, make_watermarked

    tile_hits = global_misses = 0
    for k in range(0, 800, 40):
        iid = f"img{k}"
        base, var = make_smooth_image(iid), make_watermarked(iid)
        qh = [
            bin((a ^ b) & ((1 << 64) - 1)).count("1")
            for a, b in zip(quadrant_phashes(base), quadrant_phashes(var))
        ]
        g = bin((phash64(base) ^ phash64(var)) & ((1 << 64) - 1)).count("1")
        # untouched quadrants hash identically
        assert qh[0] == 0 and qh[1] == 0 and qh[2] == 0
        tile_hits += sum(1 for x in qh if x <= 6) >= 3
        global_misses += g > 6
    assert tile_hits == 20          # the tile tier catches every variant
    assert global_misses >= 5       # ...including ones global phash misses


def test_evo_warehouse_maps_columns_by_field_id(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    from rcspark.tables import EvoWarehouse

    wh = EvoWarehouse(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame([(1, 100), (2, 200)], "k long, cents long")
    v2 = spark.createDataFrame([(3, 300, "a")], "k long, price_cents long, host string")
    wh.write_wave_ids("t", v1, 0, {"k": 1, "cents": 2})
    wh.write_wave_ids("t", v2, 1, {"k": 1, "price_cents": 2, "host": 3})
    latest = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("price_cents", T.LongType(), True),
            T.StructField("host", T.StringType(), True),
        ]
    )
    ids = {"k": 1, "price_cents": 2, "host": 3}
    old = {r["k"]: r for r in wh.read_wave_evolved("t", 0, latest, ids).collect()}
    # rename resolved through the shared field id; added column NULL-filled
    assert old[1]["price_cents"] == 100 and old[1]["host"] is None
    new = wh.read_wave_evolved("t", 1, latest, ids).collect()[0]
    assert new["price_cents"] == 300 and new["host"] == "a"
    with pytest.raises(ValueError):
        wh.write_wave_ids("t", v1, 2, {"k": 1})  # cents has no field id


def test_hidden_partitioning_prunes_through_transforms(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from rcspark.tables import HiddenPartWarehouse

    wh = HiddenPartWarehouse(spark, str(tmp_path / "wh"))
    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") * 7919 % 1000).alias("digest"),
        F.to_timestamp(
            F.concat(F.lit("2001-02-0"), (F.col("id") % 3 + 1).cast("string"),
                     F.lit(" 08:00:00"))
        ).alias("ts"),
    )
    hspec = [
        {"name": "b", "transform": "bucket", "col": "digest", "n": 4},
        {"name": "d", "transform": "days", "col": "ts"},
    ]
    wh.write_wave_hidden("t", df, 0, hspec)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("digest", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    # day-only: one day leaf under each of the 4 bucket dirs
    got, n_dirs = wh.read_wave_hidden_pruned("t", 0, schema, {"ts": "2001-02-02"})
    assert n_dirs == 4
    assert {r["k"] for r in got.collect()} == {i for i in range(200) if i % 3 == 1}
    # digest+day: exactly one leaf, and the lossy bucket is row-filtered
    d42 = 42 * 7919 % 1000
    got2, n2 = wh.read_wave_hidden_pruned(
        "t", 0, schema, {"digest": d42, "ts": "2001-02-01"}
    )
    rows = got2.collect()
    assert n2 == 1
    assert all(r["digest"] == d42 for r in rows)
    assert {r["k"] for r in rows} == {
        i for i in range(200) if i * 7919 % 1000 == d42 and i % 3 == 0
    }
    # no matching day -> zero dirs, empty result
    got3, n3 = wh.read_wave_hidden_pruned("t", 0, schema, {"ts": "1999-01-01"})
    assert n3 == 0 and got3.count() == 0


def test_cookie_jar_query_classes(spark):
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_cookie_jar"](spark, "/root/testdata/sf0.001").toPandas()
    k4 = out.o_orderkey % 4
    assert out[k4 == 0].sent.all()            # exact host: host-only cookie sent
    assert not out[k4 == 1].sent.any()        # subdomain, host-only: NOT sent
    assert out[k4 == 2].sent.all()            # subdomain, Domain= cookie: sent
    assert not out[k4 == 3].sent.any()        # foreign host: never
    assert out[out.sent].cookie_header.notna().all()
    assert out[~out.sent].cookie_header.isna().all()


def test_fasttext_quality_empty_doc_parity(spark, tmp_path):
    """Zero-word documents: Spark's aggregate(f, 0L, ...) returns 0 while
    DuckDB's list_sum([]) is NULL — the oracle coalesces to 0 so both
    engines agree (review finding, batch 22)."""
    import duckdb

    from rcspark.queries import ORACLE, QUERIES

    docs = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, "   ", "en", "s", 3),
         (3, "hello world", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(sf + "/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in QUERIES["doc_fasttext_quality"](spark, sf).collect()
    }
    assert got[1]["score"] == 0 and got[1]["keep"] is True
    assert got[2]["score"] == 0 and got[2]["n_feats"] == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    ora = {r[0]: r for r in con.execute(ORACLE["doc_fasttext_quality"]).fetchall()}
    for d in (1, 2, 3):
        assert ora[d][1] == got[d]["n_feats"]
        assert ora[d][2] == got[d]["score"]
        assert bool(ora[d][3]) == got[d]["keep"]


# ---------------------------------------------------------------------------
# Batch 23: Retry-After, AJAX-crawl, robots META, request gates, feeds
# ---------------------------------------------------------------------------


def test_retry_after_forms(spark):
    """RFC 9110 grammars: delta (trimmed), clamped delta, future date,
    past date floors at 0, junk/missing parse to NULL with mode='none'."""
    from rcspark.middleware import retry_after_cols

    base = 1445412480  # Wed, 21 Oct 2015 07:28:00 GMT
    rows = [
        ("d", "120"),
        ("d_trim", "  7 "),
        ("d_clamp", "99999"),
        ("date_future", "Wed, 21 Oct 2015 07:43:00 GMT"),   # +900
        ("date_past", "Wed, 21 Oct 2015 07:13:00 GMT"),     # -900 -> 0
        ("date_nextday", "Thu, 22 Oct 2015 05:41:20 GMT"),  # +80000 -> clamp
        ("date_badmonth", "Wed, 21 Foo 2015 07:43:00 GMT"),
        ("missing", ""),
        ("junk", "soon"),
    ]
    df = spark.createDataFrame(rows, "kind string, header string")
    cols = retry_after_cols(F.col("header"), F.lit(base).cast("long"))
    got = {
        r["kind"]: (r["wait_s"], r["mode"])
        for r in df.select(
            "kind", cols["wait_s"].alias("wait_s"), cols["mode"].alias("mode")
        ).collect()
    }
    assert got["d"] == (120, "delta")
    assert got["d_trim"] == (7, "delta")
    assert got["d_clamp"] == (3600, "delta")
    assert got["date_future"] == (900, "date")
    assert got["date_past"] == (0, "date")
    assert got["date_nextday"] == (3600, "date")
    assert got["date_badmonth"] == (None, "none")
    assert got["missing"] == (None, "none")
    assert got["junk"] == (None, "none")


def test_ajaxcrawl_rewrite(spark):
    """'#!' fragments rewrite to _escaped_fragment_ (pct-encoded, & when a
    query exists); meta-fragment pages get the empty-value form; plain
    '#anchor' is left alone."""
    from rcspark.middleware import ajaxcrawl_cols

    plain = "<html><body>x</body></html>"
    meta = '<html><head><meta name="fragment" content="!"></head></html>'
    rows = [
        ("hb", "http://h.example/p#!s=1&f=a+b", plain),
        ("hb_query", "http://h.example/p?q=2#!x=y", plain),
        ("anchor", "http://h.example/p#plain", plain),
        ("meta", "http://h.example/p", meta),
        ("none", "http://h.example/p", plain),
    ]
    df = spark.createDataFrame(rows, "kind string, url string, body string")
    cols = ajaxcrawl_cols(F.col("url"), F.col("body"))
    got = {
        r["kind"]: (r["crawlable"], r["fetch_url"])
        for r in df.select(
            "kind",
            cols["crawlable"].alias("crawlable"),
            cols["fetch_url"].alias("fetch_url"),
        ).collect()
    }
    assert got["hb"] == (
        True, "http://h.example/p?_escaped_fragment_=s%3D1%26f%3Da%2Bb"
    )
    assert got["hb_query"] == (
        True, "http://h.example/p?q=2&_escaped_fragment_=x%3Dy"
    )
    assert got["anchor"] == (False, "http://h.example/p#plain")
    assert got["meta"] == (True, "http://h.example/p?_escaped_fragment_=")
    assert got["none"] == (False, "http://h.example/p")


def test_robots_meta_union(spark):
    """Directives union across meta tag and X-Robots-Tag header; 'none'
    implies both; matching is case- and whitespace-insensitive."""
    from rcspark.middleware import robots_meta_cols

    tag = lambda c: f'<html><head><meta name="robots" content="{c}"></head></html>'  # noqa: E731
    rows = [
        ("clean", "", "<html/>"),
        ("hdr_only", "noindex", "<html/>"),
        ("meta_only", "", tag("NOFOLLOW")),
        ("both_union", "noindex", tag("nofollow")),
        ("none_kw", "", tag("none")),
        ("spaced", " noindex , nofollow ", "<html/>"),
        ("noarchive_only", "noarchive", "<html/>"),
    ]
    df = spark.createDataFrame(rows, "kind string, header_tag string, body string")
    cols = robots_meta_cols(F.col("header_tag"), F.col("body"))
    got = {
        r["kind"]: (r["noindex"], r["nofollow"])
        for r in df.select(
            "kind",
            cols["noindex"].alias("noindex"),
            cols["nofollow"].alias("nofollow"),
        ).collect()
    }
    assert got["clean"] == (False, False)
    assert got["hdr_only"] == (True, False)
    assert got["meta_only"] == (False, True)
    assert got["both_union"] == (True, True)
    assert got["none_kw"] == (True, True)
    assert got["spaced"] == (True, True)
    assert got["noarchive_only"] == (False, False)


def test_request_gates_precedence(spark):
    """scheme > length > extension; media arrivals bypass the extension
    gate (deny_extensions applies to FOLLOWED links only)."""
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_request_gates"](
        spark, "/root/testdata/sf0.001"
    ).toPandas().set_index("p_partkey")
    # k%6==2 -> mailto (scheme gate wins even at k%11==0 lengths)
    mailto = out[out.scheme == "mailto"]
    assert (mailto.drop_reason == "scheme").all()
    # long http URLs -> length
    longs = out[(out.url_len > 2083) & out.scheme.isin(["http", "https"])]
    assert len(longs) and (longs.drop_reason == "length").all()
    # page + .pdf/.exe/.jpg -> extension; media with same ext -> none
    page_ext = out[(out.kind == "page") & out.ext.isin([".pdf", ".exe", ".jpg"])
                   & (out.url_len <= 2083)]
    assert len(page_ext) and (page_ext.drop_reason == "extension").all()
    media_ext = out[(out.kind == "media") & out.ext.isin([".pdf", ".exe", ".jpg"])
                    & (out.url_len <= 2083)]
    assert len(media_ext) and (media_ext.drop_reason == "none").all()


def test_feed_extract_dialects(spark):
    """RSS <link> text vs Atom <link href=>; per-entry titles line up."""
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_feed_extract"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert set(out.feed_type) == {"rss", "atom"}
    assert (out.link.str.startswith("http://h")).all()
    assert (out.title.str.startswith("Order ")).all()
    # link and title carry the SAME order key per row
    keys_from_link = out.link.str.extract(r"/o/(\d+)$")[0]
    keys_from_title = out.title.str.extract(r"Order (\d+)$")[0]
    assert (keys_from_link == keys_from_title).all()
    # hosts h0..h15, even hosts rss / odd atom
    hn = out.host.str.lstrip("h").astype(int)
    assert ((hn % 2 == 0) == (out.feed_type == "rss")).all()


# ---------------------------------------------------------------------------
# Batch 24: image+caption acquisition plane
# ---------------------------------------------------------------------------


def test_opengraph_precedence_and_resolution(spark):
    """og > twitter > <title> caption rungs; image refs resolve per RFC 3986
    (absolute / protocol-relative / root-relative / dir-relative)."""
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_opengraph_extract"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    m = out.o_orderkey % 6
    og_full = out[m == 0]
    assert (og_full.caption_source == "og").all()
    assert og_full.caption.str.match(r"Part \d+ - Spec sheet \d+").all()
    assert og_full.image_url.str.match(r"http://h\d+\.example/img/\d+\.jpg").all()
    assert og_full.has_pair.all()
    og_abs = out[m == 1]
    assert og_abs.image_url.str.match(r"http://cdn\d\.example/i/\d+\.png").all()
    assert (~og_abs.caption.str.contains(" - ")).all()  # no description rung
    tw = out[m == 2]
    assert (tw.caption_source == "twitter").all()
    # protocol-relative ref inherits the page scheme
    assert tw.image_url.str.startswith("http://cdn.example/t/").all()
    title_only = out[m == 3]
    assert (title_only.caption_source == "title").all()
    assert title_only.image_url.isna().all() and (~title_only.has_pair).all()
    rel = out[m == 4]
    # dir-relative resolves into the page's directory
    assert rel.image_url.str.match(
        r"http://h\d+\.example/o/\d+/gallery/\d+\.jpg"
    ).all()
    none = out[m == 5]
    assert (none.caption_source == "none").all()
    assert none.caption.isna().all() and (~none.has_pair).all()


def test_srcset_election_rules(spark):
    """w beats x; smallest width >= target, else largest; highest density;
    src only when srcset is absent."""
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_srcset_select"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    m = out.o_orderkey % 4
    assert (out[m == 0].kind == "src").all()
    assert (out[m == 0].n_candidates == 1).all()
    assert (out[m == 1].width_or_density == 800).all()  # smallest >= 800
    assert (out[m == 2].width_or_density == 640).all()  # largest below
    x = out[m == 3]
    assert (x.kind == "x").all() and (x.width_or_density == 2).all()
    assert x.chosen_url.str.contains("@2x").all()
    # every chosen_url is absolute after resolution
    assert out.chosen_url.str.startswith("http://").all()


def test_hsts_upgrade_rules(spark):
    """exact always; parent only with includeSubDomains; max-age=0 and
    absent policies never upgrade; scheme flips only on upgrade."""
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_hsts_upgrade"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    hn = out.host.str.extract(r"h(\d+)\.example")[0].astype(int)
    assert (out.upgraded == (out.matched_via != "none")).all()
    assert (
        out.upgraded_url.str.startswith("https://") == out.upgraded
    ).all()
    ex = out[out.matched_via == "exact"]
    assert len(ex) and (~ex.host.str.startswith("sub.")).all()
    assert (hn[ex.index] % 4 < 2).all()
    par = out[out.matched_via == "parent"]
    assert len(par) and par.host.str.startswith("sub.").all()
    assert (hn[par.index] % 4 == 0).all()
    # includeSubDomains missing: sub hosts of an hn%4==1 policy stay http
    ex1 = set(hn[ex.index][hn[ex.index] % 4 == 1])
    sub1 = out[out.host.str.startswith("sub.") & hn.isin(ex1)]
    assert len(sub1) and (sub1.matched_via == "none").all()
    # max-age=0 or no policy at all
    assert (out[(hn % 4 >= 2)].matched_via == "none").all()


def test_soft404_classes(spark):
    """title heuristic and per-(host, length) template cluster fire on
    their planted classes and not on normal pages."""
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_soft404_detect"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    m = out.o_orderkey % 11
    assert out[m == 0].title_hit.all() and out[m == 0].soft404.all()
    tpl = out[m == 1]
    # cluster fires exactly where the per-host template count clears the
    # threshold (small hosts at sf0.001 legitimately stay under it)
    host_n = tpl.groupby("host").o_orderkey.transform("size")
    assert (tpl.cluster_hit == (host_n >= 5)).all()
    assert tpl.cluster_hit.sum() > len(tpl) * 0.7
    assert (tpl.soft404 == tpl.cluster_hit).all()
    assert (~tpl.title_hit).all()
    normal = out[(m > 1) & ~out.o_orderkey.astype(str).str.contains("404")]
    assert len(normal) and (~normal.soft404).all()
    assert (normal.body_len >= 200 + len("<title>Item </title>")).all()


def test_hreflang_representative_election(spark):
    """x-default target (en) wins when present; partial clusters fall back
    to the (lang, url) minimum; langs_csv is the sorted member set."""
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_hreflang_groups"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert (out.n_variants == out.langs_csv.str.split(",").str.len()).all()
    with_en = out[out.langs_csv.str.split(",").apply(lambda L: "en" in L)]
    assert len(with_en) and (with_en.rep_lang == "en").all()
    without_en = out[~out.langs_csv.str.split(",").apply(lambda L: "en" in L)]
    if len(without_en):
        assert (
            without_en.rep_lang
            == without_en.langs_csv.str.split(",").str[0]
        ).all()
    full = out[out.n_variants == 6]
    assert len(full) and (full.langs_csv == "de,en,es,fr,ja,pt").all()
    assert out.rep_url.str.contains("/p/").all()


# ---------------------------------------------------------------------------
# Batch 25: pair-curation gates + pagination chains
# ---------------------------------------------------------------------------


def test_pagination_chain_reconstruction(spark):
    """Chains reassemble with contiguous positions from each head; a hole
    in the crawl splits a chain (the orphaned tail elects its own head)."""
    from rcspark.queries import QUERIES

    out = QUERIES["crawl_pagination_chain"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    # every chain: positions are exactly 0..len-1
    for cid, g in out.groupby("chain_id"):
        assert sorted(g.pos) == list(range(len(g)))
        assert (g.chain_len == len(g)).all()
        # the head is the chain_id itself at pos 0
        assert g[g.pos == 0].url.iloc[0] == cid
    # multi-page chains exist, and every member shares the head's list id
    multi = out[out.chain_len >= 3]
    assert len(multi)
    lid = multi.url.str.extract(r"/list/(\d+)/")[0]
    lid_head = multi.chain_id.str.extract(r"/list/(\d+)/")[0]
    assert (lid == lid_head).all()


def test_pair_cosine_gate_verdicts(spark):
    """keep == (clip_sim >= threshold); both classes occur; pairs are
    (even, even^1)."""
    from rcspark.queries import QUERIES, CLIP_GATE_MIN

    out = QUERIES["emb_pair_cosine_gate"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert (out.img_id % 2 == 0).all()
    assert (out.txt_id == (out.img_id ^ 1)).all()
    assert (out.keep == (out.clip_sim >= CLIP_GATE_MIN)).all()
    assert out.keep.any() and (~out.keep).any()
