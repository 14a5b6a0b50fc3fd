"""End-to-end engine-vs-oracle equality — the north rule's core checks:

- crawl-order equality (exact sequence of url_canon, incl. waves/fetch_ms)
- URL-seen-set equality (exact, on canonical URLs; digest set as audit)
- caption exact equality; decoded-pixel allclose (exact for ppm,
  PSNR ≥ 40 dB vs the unquantized source for qppm)
- per-partition lineage consistency
- resume exactness after an interrupted run (fresh engine on the same
  warehouse, incl. a fake partial wave dir from a "killed" writer)
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rcspark.codecs import decode_image, psnr, quantize
from rcspark.fixtures import make_fixture, make_image
from rcspark.oracle import run_oracle
from rcspark.run import CrawlEngine
from rcspark.xxh import xxh64_str

WEB_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("redirect_to", T.StringType(), True),
        T.StructField("body", T.BinaryType(), False),
    ]
)
CORPUS_SRC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def engine_inputs(spark, fx):
    web = spark.createDataFrame(
        fx.web[["url_canon", "status", "redirect_to", "body"]], WEB_SCHEMA
    )
    corpus_src = spark.createDataFrame(
        fx.corpus[["url", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]],
        CORPUS_SRC_SCHEMA,
    )
    return web, corpus_src


def run_engine(spark, fx, root, max_waves=200):
    web, corpus_src = engine_inputs(spark, fx)
    eng = CrawlEngine(spark, root, web, corpus_src, fx.robots, fx.seeds, fx.allowed_hosts)
    eng.run(max_waves=max_waves)
    return eng


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    fx = make_fixture(n_hosts=5, urls_per_host=25, link_fanout=5.0, seed=11)
    orc = run_oracle(fx)
    root = str(tmp_path_factory.mktemp("wh"))
    eng = run_engine(spark, fx, root)
    yield fx, orc, eng
    shutil.rmtree(root, ignore_errors=True)


def test_crawl_order_equality(crawl):
    _, orc, eng = crawl
    log = eng.fetch_log().filter(F.col("seq").isNotNull()).orderBy("seq").collect()
    engine_order = [
        (r.seq, r.url_canon, r.wave, r.fetch_ms, r.result, r.status) for r in log
    ]
    oracle_order = [
        (r["seq"], r["url_canon"], r["wave"], r["fetch_ms"], r["result"], r["status"])
        for r in orc.order
    ]
    assert len(engine_order) > 30
    assert engine_order == oracle_order


def test_seen_set_equality(crawl):
    _, orc, eng = crawl
    rows = eng.seen_table().collect()
    assert {r.url_canon for r in rows} == orc.seen
    # digest audit: engine digests equal host-side xxhash64 twin
    assert {r.digest for r in rows} == {xxh64_str(u) for u in orc.seen}


def test_robots_denied_equality(crawl):
    _, orc, eng = crawl
    denied = (
        eng.fetch_log().filter(F.col("result") == "robots_denied").collect()
    )
    assert sorted(r.url_canon for r in denied) == sorted(orc.robots_denied)
    assert len(denied) > 0


def test_corpus_caption_and_pixels(crawl):
    _, orc, eng = crawl
    e = {r.image_id: r for r in eng.corpus_table().collect()}
    o = {c["image_id"]: c for c in orc.corpus}
    assert set(e) == set(o) and len(e) > 5
    saw_lossy = False
    for iid in o:
        assert e[iid].caption == o[iid]["caption"]          # caption equality
        ep, efmt = decode_image(bytes(e[iid].bytes))
        op, _ = decode_image(bytes(o[iid]["bytes"]))
        assert np.array_equal(ep, op)                        # pixel allclose (exact)
        # fidelity vs the ORIGINAL (pre-encode) pixels, via make_image's rng scheme
        from rcspark.xxh import xxh64 as _xxh

        seed32 = _xxh(iid.encode()) & 0xFFFFFFFF
        orig = np.random.default_rng(seed32).integers(
            0, 256, (ep.shape[0], ep.shape[1], 3), dtype=np.uint8
        )
        if efmt == "ppm":
            assert np.array_equal(ep, orig)
        else:
            saw_lossy = True
            assert psnr(orig, ep) >= 40.0
    assert saw_lossy


def test_lineage_consistency(crawl):
    _, orc, eng = crawl
    lin = eng.lineage_table()
    agg = lin.agg(
        F.sum("scheduled").alias("s"),
        F.sum("fetched").alias("f"),
        F.sum("retried").alias("r"),
        F.sum("robots_denied").alias("d"),
        F.sum("failed").alias("x"),
    ).collect()[0]
    assert agg["s"] == len(orc.order)
    assert agg["f"] == sum(1 for r in orc.order if r["result"] == "fetched")
    assert agg["r"] == sum(1 for r in orc.order if r["result"] == "retry")
    assert agg["d"] == len(orc.robots_denied)
    assert agg["x"] == sum(1 for r in orc.order if r["result"] == "failed")


def test_compaction_mid_crawl_preserves_everything(spark, tmp_path):
    """Warehouse.compact (the Iceberg rewrite-data-files analogue):
    consolidating an APPEND table's per-wave dirs mid-crawl — including
    the bucketed `seen` — must not change any final table, and the crawl
    must keep appending past the compaction watermark."""
    from rcspark.tables import FETCH_LOG_SCHEMA, SEEN_SCHEMA

    fx = make_fixture(n_hosts=4, urls_per_host=15, link_fanout=5.0, seed=23)
    root_a, root_b = str(tmp_path / "a"), str(tmp_path / "b")
    eng_a = run_engine(spark, fx, root_a)

    web, corpus_src = engine_inputs(spark, fx)
    eng_b = CrawlEngine(spark, root_b, web, corpus_src, fx.robots, fx.seeds, fx.allowed_hosts)
    for _ in range(3):
        eng_b.run_wave()
    eng_b.wh.compact("seen", SEEN_SCHEMA)
    eng_b.wh.compact("fetch_log", FETCH_LOG_SCHEMA)
    # per-wave dirs <= watermark are no longer read; the compact dir is
    c, meta = eng_b.wh.last_committed()
    assert meta["compacted"] == {"seen": c, "fetch_log": c}
    # gc removes exactly the superseded per-wave dirs, and nothing breaks
    removed = eng_b.wh.gc("seen") + eng_b.wh.gc("fetch_log")
    assert removed and all(f"wave=" in p for p in removed)
    eng_b.run(max_waves=200)

    def snap(eng):
        log = [
            tuple(r)
            for r in eng.fetch_log()
            .orderBy(F.col("seq").asc_nulls_last(), "url_canon")
            .collect()
        ]
        seen = sorted((r.digest, r.url_canon) for r in eng.seen_table().collect())
        return log, seen

    assert snap(eng_a) == snap(eng_b)


def test_compact_rerun_is_noop_and_gc_guards_historical_reads(spark, tmp_path):
    """Two warehouse invariants (ADVICE r2, high + low):

    1. compact() re-run at an unchanged watermark must be a no-op — the
       old code rmtree'd the live compact dir (the only copy of gc()'d
       waves) before lazily re-reading it, silently losing the table.
    2. After gc(), a historical read_appends below the compaction
       watermark must raise, not silently return partial data.
    """
    from rcspark.tables import SEEN_SCHEMA, Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    rows_by_wave = {
        w: [(w * 10 + i, f"https://h{i}.test/p{w}", w) for i in range(5)]
        for w in range(3)
    }
    for w in range(3):
        wh.write_wave("seen", spark.createDataFrame(rows_by_wave[w], SEEN_SCHEMA), w)
    wh.commit(2, {})

    all_rows = sorted(r for rs in rows_by_wave.values() for r in rs)

    def snap():
        return sorted(tuple(r) for r in wh.read_appends("seen", 2, SEEN_SCHEMA).collect())

    wh.compact("seen", SEEN_SCHEMA)
    assert snap() == all_rows
    wh.gc("seen")
    # the killer call pattern: compact again with nothing new appended
    wh.compact("seen", SEEN_SCHEMA)
    assert snap() == all_rows

    # historical read below the watermark now needs gc()'d dirs → raise
    with pytest.raises(FileNotFoundError, match="gc"):
        wh.read_appends("seen", 1, SEEN_SCHEMA).collect()

    # appending past the watermark and recompacting still works
    wh.write_wave("seen", spark.createDataFrame([(99, "https://h9.test/x", 3)], SEEN_SCHEMA), 3)
    wh.commit(3, wh.last_committed()[1])
    wh.compact("seen", SEEN_SCHEMA)
    got = sorted(tuple(r) for r in wh.read_appends("seen", 3, SEEN_SCHEMA).collect())
    assert got == sorted(all_rows + [(99, "https://h9.test/x", 3)])


def test_gc_sweeps_crash_leftovers_instead_of_wedging(spark, tmp_path):
    """ADVICE r3: a kill mid-compact()-swap can leave
    'compact=NNNNNN.superseded' / '.inprogress' dirs; gc() used to do
    int('000000.superseded') on the name and raise ValueError forever.
    They are never manifest-referenced, so gc must DELETE them."""
    import os

    from rcspark.tables import SEEN_SCHEMA, Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for w in range(2):
        rows = [(w * 10 + i, f"https://h{i}.test/p{w}", w) for i in range(5)]
        wh.write_wave("seen", spark.createDataFrame(rows, SEEN_SCHEMA), w)
    wh.commit(1, {})
    wh.compact("seen", SEEN_SCHEMA)
    tdir = os.path.join(wh.root, "seen")
    for leftover in ("compact=000000.superseded", "compact=000001.inprogress"):
        os.makedirs(os.path.join(tdir, leftover, "junk"))
    removed = wh.gc("seen")
    names = {os.path.basename(p) for p in removed}
    assert "compact=000000.superseded" in names
    assert "compact=000001.inprogress" in names
    # the live compact dir and the data survive
    got = sorted(tuple(r) for r in wh.read_appends("seen", 1, SEEN_SCHEMA).collect())
    assert len(got) == 10
    # and a second gc run is clean (nothing left to sweep, no ValueError)
    assert wh.gc("seen") == []


def test_read_appends_raises_when_watermark_dropped(spark, tmp_path):
    """A commit that does NOT carry the manifest meta forward drops the
    compaction watermark; a subsequent read must raise (the gc()'d waves
    only exist in the compact dir the reader no longer knows about), not
    silently return partial data."""
    from rcspark.tables import SEEN_SCHEMA, Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for w in range(2):
        rows = [(w * 10 + i, f"https://h{i}.test/p{w}", w) for i in range(5)]
        wh.write_wave("seen", spark.createDataFrame(rows, SEEN_SCHEMA), w)
    wh.commit(1, {})
    wh.compact("seen", SEEN_SCHEMA)
    wh.gc("seen")
    wh.write_wave(
        "seen", spark.createDataFrame([(99, "https://h9.test/x", 2)], SEEN_SCHEMA), 2
    )
    wh.commit(2, {})  # the bug pattern: meta NOT carried forward
    with pytest.raises(FileNotFoundError, match="watermark"):
        wh.read_appends("seen", 2, SEEN_SCHEMA)


def test_burst_mode_order_equality(spark, tmp_path, monkeypatch):
    """Per-domain concurrency (VERDICT r1 missing #6): with DOWNLOAD_DELAY
    monkeypatched to 0, hosts carrying no robots crawl_delay engage the
    CONCURRENT_PER_DOMAIN burst regime (group fetches per
    REQUEST_SERVICE_MS tick) while delayed hosts keep the 1-per-tick
    model; engine crawl order must still equal the oracle's exactly. Both
    worlds read the shared constant at call time."""
    import rcspark.constants as C

    monkeypatch.setattr(C, "DOWNLOAD_DELAY", 0.0)
    fx = make_fixture(n_hosts=4, urls_per_host=15, link_fanout=5.0, seed=29)
    orc = run_oracle(fx)
    eng = run_engine(spark, fx, str(tmp_path / "wh"))
    log = eng.fetch_log().filter(F.col("seq").isNotNull()).orderBy("seq").collect()
    engine_order = [(r.seq, r.url_canon, r.wave, r.fetch_ms) for r in log]
    oracle_order = [
        (r["seq"], r["url_canon"], r["wave"], r["fetch_ms"]) for r in orc.order
    ]
    assert len(engine_order) > 30
    assert engine_order == oracle_order
    assert {r.url_canon for r in eng.seen_table().collect()} == orc.seen
    # the burst regime actually engaged: some host issued multiple fetches
    # at the same simulated instant
    from collections import Counter

    same_ms = Counter((r.host, r.wave, r.fetch_ms) for r in log)
    assert max(same_ms.values()) > 1


def test_resume_exactness(spark, tmp_path):
    """Kill after k waves (+ leave a partial uncommitted dir); a fresh engine
    must produce byte-identical final tables vs an uninterrupted run."""
    fx = make_fixture(n_hosts=4, urls_per_host=15, link_fanout=5.0, seed=23)
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    eng_a = run_engine(spark, fx, root_a)

    web, corpus_src = engine_inputs(spark, fx)
    eng_b1 = CrawlEngine(spark, root_b, web, corpus_src, fx.robots, fx.seeds, fx.allowed_hosts)
    for _ in range(2):
        eng_b1.run_wave()
    # simulate a killed writer: garbage wave dir beyond the committed manifest
    c, _ = eng_b1.wh.last_committed()
    junk = os.path.join(root_b, "fetch_log", f"wave={c + 1:06d}")
    os.makedirs(junk, exist_ok=True)
    with open(os.path.join(junk, "part-junk.parquet"), "w") as f:
        f.write("not parquet")
    eng_b2 = CrawlEngine(spark, root_b, web, corpus_src, fx.robots, fx.seeds, fx.allowed_hosts)
    eng_b2.run(max_waves=200)

    def snap(eng):
        log = [
            tuple(r)
            for r in eng.fetch_log()
            .orderBy(F.col("seq").asc_nulls_last(), "url_canon")
            .collect()
        ]
        seen = sorted((r.digest, r.url_canon) for r in eng.seen_table().collect())
        corpus = sorted(
            (r.image_id, bytes(r.bytes), r.caption, r.phash, r.wave)
            for r in eng.corpus_table().collect()
        )
        return log, seen, corpus

    assert snap(eng_a) == snap(eng_b2)


def test_convert_on_store_png_corpus(spark, tmp_path):
    """A16 convert-on-store: an engine with store_format='png' writes a
    corpus of REAL PNG files whose decoded pixels and captions equal the
    pass-through engine's exactly (PNG is lossless) — the Scrapy
    ImagesPipeline convert semantic with an interoperable format."""
    from rcspark.codecs import decode_image
    from rcspark.png import PNG_SIG

    fx = make_fixture(n_hosts=3, urls_per_host=10, seed=7)
    web, corpus_src = engine_inputs(spark, fx)
    eng_a = CrawlEngine(
        spark, str(tmp_path / "raw"), web, corpus_src,
        fx.robots, fx.seeds, fx.allowed_hosts,
    )
    eng_a.run()
    eng_b = CrawlEngine(
        spark, str(tmp_path / "png"), web, corpus_src,
        fx.robots, fx.seeds, fx.allowed_hosts, store_format="png",
    )
    eng_b.run()

    raw = {r.image_id: r for r in eng_a.corpus_table().collect()}
    png = {r.image_id: r for r in eng_b.corpus_table().collect()}
    assert set(raw) == set(png) and raw
    for image_id, r in png.items():
        assert r.fmt == "png"
        assert bytes(r.bytes)[:8] == PNG_SIG
        pix_png, fmt = decode_image(bytes(r.bytes))
        assert fmt == "png"
        pix_raw, _ = decode_image(bytes(raw[image_id].bytes))
        assert (pix_png == pix_raw).all()
        assert r.caption == raw[image_id].caption
        assert r.phash == raw[image_id].phash
