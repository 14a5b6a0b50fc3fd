"""Semantic properties of the round-3 batch-9 operators — invariants the
rows+schema+hash oracles can't state: α-temperature upweighting direction,
PMI support/order laws, int8 quantization error bounds, conditional-GET
status partitioning, and the planted sharp/blurred separation."""

import pytest

from rcspark.queries import _SHARP_THRESH, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch9")


def test_mixture_weights_temper_the_head(spark):
    rows = QUERIES["doc_mixture_weights"](spark, SF_DIR).collect()
    assert sum(r.sample_permille for r in rows) <= 1000
    # α=0.5 upweights small domains: sampling rate per doc must be
    # non-increasing in domain size
    by_size = sorted(rows, key=lambda r: r.n_docs)
    rates = [r.sample_permille / r.n_docs for r in by_size]
    assert all(a >= b - 1e-12 for a, b in zip(rates, rates[1:]))
    for r in rows:
        assert r.alpha_w * r.alpha_w <= r.n_docs < (r.alpha_w + 1) ** 2


def test_pmi_support_and_order(spark):
    rows = QUERIES["doc_pmi_collocations"](spark, SF_DIR).collect()
    assert rows, "corpus must yield collocations"
    assert all(r.c_xy >= 3 and r.score_ppm > 0 for r in rows)
    ranked = sorted(rows, key=lambda r: r.rnk)
    assert [r.rnk for r in ranked] == list(range(1, len(ranked) + 1))
    scores = [r.score_ppm for r in ranked]
    assert scores == sorted(scores, reverse=True)
    # a true collocation lifts above independence: the top hit must beat
    # the 1e6-ppm independence baseline
    assert scores[0] > 1_000_000


def test_int8_quant_error_bounds(spark):
    rows = QUERIES["emb_int8_quant"](spark, SF_DIR).collect()
    for r in rows:
        assert r.scale >= 0
        assert abs(r.code_sum) <= 127 * r.n_dims
        # half-away rounding: |127·q − code·scale| ≤ (scale+1)/2 per dim
        assert r.err_sum <= r.n_dims * (r.scale + 1) // 2 + r.n_dims


def test_conditional_get_status_partition(spark):
    rows = QUERIES["crawl_conditional_get"](spark, SF_DIR).collect()
    statuses = {r.status for r in rows}
    assert statuses <= {"miss", "fresh", "revalidate_304", "revalidate_200"}
    assert {"miss", "revalidate_304", "revalidate_200"} <= statuses
    for r in rows:
        if r.status == "miss":
            assert r.fetched_wave is None and r.etag_cached is None
        else:
            assert r.etag_cached is not None
        assert (r.bytes_saved > 0) == (r.status == "revalidate_304")
        if r.status == "revalidate_304":
            assert r.etag_cached == r.etag_current
        if r.status == "revalidate_200":
            assert r.etag_cached != r.etag_current


def test_sharpness_separates_planted_blur(spark):
    rows = QUERIES["img_sharpness"](spark, SF_DIR).collect()
    orig = [r for r in rows if r.item_id.startswith("o:")]
    blur = [r for r in rows if r.item_id.startswith("b:")]
    assert orig and len(orig) == len(blur)
    assert all(r.is_sharp for r in orig)
    assert not any(r.is_sharp for r in blur)
    # the gap is structural, not threshold-tuned: every original clears
    # the threshold by 2x, every blur sits at least 2x under it
    assert min(r.lap_meansq for r in orig) > 2 * _SHARP_THRESH
    assert max(r.lap_meansq for r in blur) < _SHARP_THRESH // 2


# -- batch 10 -----------------------------------------------------------------


def test_quality_audit_invariants(spark):
    rows = {r.check_name: r.value for r in
            QUERIES["table_quality_audit"](spark, SF_DIR).collect()}
    assert rows["row_count"] > 0
    # testdata is clean: every violation check must read zero
    for k in ("nulls:o_custkey", "unique_violations:o_orderkey",
              "range_violations:o_totalprice", "domain_violations:o_orderstatus"):
        assert rows[k] == 0, k
    assert rows["distinct:o_orderstatus"] == 3
    assert rows["freshness_span_days:o_orderdate"] > 0


def test_matryoshka_recall_floor(spark):
    rows = QUERIES["emb_matryoshka_truncate"](spark, SF_DIR).collect()
    assert len(rows) == 25  # 5 probes x top-5
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    for probe, hits in by_probe.items():
        assert sorted(r.rnk_trunc for r in hits) == [1, 2, 3, 4, 5]
    # the 16-dim prefix must retrieve SOMETHING the full ranking agrees
    # with — a zero overall recall would mean the prefix carries no signal
    assert sum(r.in_full_top5 for r in rows) > 0


def test_clipping_gate_separates_planted_gain(spark):
    rows = QUERIES["audio_clipping_gate"](spark, SF_DIR).collect()
    orig = [r for r in rows if r.item_id.startswith("o:")]
    gained = [r for r in rows if r.item_id.startswith("g:")]
    assert orig and len(orig) == len(gained)
    assert all(r.clip_ppm == 0 and not r.is_clipped for r in orig)
    assert all(r.is_clipped and r.peak_abs == 32767 for r in gained)
    assert min(r.clip_ppm for r in gained) > 500_000


def test_letterbox_recovers_planted_geometry(spark):
    from rcspark.xxh import xxh64

    rows = QUERIES["img_letterbox_crop"](spark, SF_DIR).collect()
    orig = {r.item_id[2:]: r for r in rows if r.item_id.startswith("o:")}
    boxed = {r.item_id[2:]: r for r in rows if r.item_id.startswith("l:")}
    assert orig and set(orig) == set(boxed)
    for iid, r in orig.items():
        assert not r.has_bars and (r.crop_w, r.crop_h) == (r.w, r.h)
        b = boxed[iid]
        h64 = xxh64(iid.encode())
        t = 4 + (h64 >> 4) % 9
        if h64 % 2 == 0:  # letterbox: vertical bars
            assert (b.crop_top, b.crop_left) == (t, 0)
            assert (b.crop_w, b.crop_h) == (r.w, r.h)
            assert b.h == r.h + 2 * t
        else:  # pillarbox
            assert (b.crop_top, b.crop_left) == (0, t)
            assert (b.crop_w, b.crop_h) == (r.w, r.h)
            assert b.w == r.w + 2 * t
        assert b.has_bars


# -- batch 11 -----------------------------------------------------------------


def test_ab_lift_consistency(spark):
    rows = {r.variant: r for r in QUERIES["events_ab_lift"](spark, SF_DIR).collect()}
    assert set(rows) == {"control", "treatment"}
    c, t = rows["control"], rows["treatment"]
    assert c.lift_ppm == 0  # control vs itself
    assert all(0 < r.conversions <= r.exposures for r in rows.values())
    # lift sign must agree with the rate comparison in exact rationals
    lhs = t.conversions * c.exposures
    rhs = t.exposures * c.conversions
    if lhs > rhs:
        assert t.lift_ppm >= 0
    elif lhs < rhs:
        assert t.lift_ppm < 0


def test_incr_agg_equals_recompute(spark):
    from rcspark.queries import load
    from pyspark.sql import functions as F

    got = {
        r.k: (r.n_rows, r.sum_cents)
        for r in QUERIES["warehouse_incr_agg"](spark, SF_DIR).collect()
    }
    orders = load(spark, SF_DIR, "orders")
    want = {
        r.k: (r.n, r.s)
        for r in orders.groupBy((F.col("o_custkey") % 100).alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_late_data_actually_drops(spark):
    from rcspark.queries import load
    from pyspark.sql import functions as F

    rows = QUERIES["stream_late_data"](spark, SF_DIR).collect()
    emitted = sum(r.n for r in rows)
    ev = load(spark, SF_DIR, "events")
    mx = ev.agg(F.max("ts")).first()[0]
    naive_in_emitted = ev.filter(
        F.window("ts", "1 hour").end.cast("timestamp_ntz")
        <= F.lit(mx) - F.expr("INTERVAL 2 HOURS")
    ).count()
    # the late segment must have visibly lost rows to the watermark
    assert emitted < naive_in_emitted
    dropped = naive_in_emitted - emitted
    assert dropped > 0


# -- batch 12 -----------------------------------------------------------------


def test_geoip_covering_range(spark):
    rows = QUERIES["crawl_geoip_enrich"](spark, SF_DIR).collect()
    assert rows
    matched = [r for r in rows if r.country is not None]
    assert matched, "some IPs must land inside a range"
    for r in rows:
        assert 0 <= r.ip < 2**32 and r.block == r.ip // 16777216
        if r.start is not None:
            # the matched range start is in the same block and <= ip
            assert r.start // 16777216 == r.block and r.start <= r.ip
        else:
            assert r.country is None


def test_gap_fill_dense_and_locf(spark):
    rows = QUERIES["events_gap_fill"](spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    n_hours = {len(v) for v in by_type.values()}
    assert len(n_hours) == 1, "every type spans the same global spine"
    gaps = [r for r in rows if not r.observed]
    assert gaps, "the spine must contain filled gaps"
    assert all(r.n == 0 for r in gaps)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.hour_s)
        carried = 0
        for r in rs:
            if r.observed:
                carried = r.n
            assert r.n_locf == carried


def test_code_detect_separates_planted(spark):
    rows = QUERIES["doc_code_detect"](spark, SF_DIR).collect()
    planted = [r for r in rows if r.doc_id % 10 == 0]
    prose = [r for r in rows if r.doc_id % 10 != 0]
    assert planted and prose
    assert all(r.is_code for r in planted)
    assert not any(r.is_code for r in prose)


def test_resample_energy_bounds(spark):
    rows = QUERIES["audio_resample"](spark, SF_DIR).collect()
    for r in rows:
        assert r.rate_out == 4000 and r.n_out == 2000
        # box filter can't create energy: mean |out| <= 32767 and
        # Cauchy-Schwarz keeps sum_sq <= 32767 * sum_abs
        assert 0 < r.sum_abs <= 32767 * r.n_out
        assert r.sum_sq <= 32767 * r.sum_abs


# -- batch 13 -----------------------------------------------------------------


def test_asset_filter_partition(spark):
    rows = QUERIES["crawl_asset_filter"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.keep == (not r.is_asset)
        if r.ext:
            assert r.url.endswith("." + r.ext)
    assert any(r.is_asset for r in rows) and any(r.keep for r in rows)


def test_metadata_check_flags_planted_lies(spark):
    rows = QUERIES["img_metadata_check"](spark, SF_DIR).collect()
    for r in rows:
        k = int(r.image_id[3:])
        if k % 7 == 0:
            assert r.status == "dim_mismatch" and not r.dim_match
        elif k % 14 == 0:
            assert r.status == "phash_mismatch" and not r.phash_match
        else:
            assert r.status == "ok" and r.dim_match and r.phash_match


def test_fairness_bounds(spark):
    (r,) = QUERIES["crawl_host_fairness"](spark, SF_DIR).collect()
    assert 0 <= r.gini_ppm < 1_000_000
    assert r.total // r.n_hosts <= r.top_share_ppm * r.total // 1_000_000 + r.n_hosts
    # uniform-ish custkey distribution: Gini must be small but the stat
    # must be exact-integer reproducible (pinned by the oracle hash)


def test_dataset_card_consistency(spark):
    (r,) = QUERIES["doc_dataset_card"](spark, SF_DIR).collect()
    assert r.n_docs > 0 and r.n_tokens > 0
    assert r.p50_chars <= r.p90_chars <= r.n_chars
    assert r.n_langs >= 1 and r.n_sources >= 1


# -- batch 14 -----------------------------------------------------------------


def test_winnow_guarantee(spark):
    from rcspark.datapipe.text import SHINGLE_K
    from rcspark.queries import _WINNOW_W, load
    from pyspark.sql import functions as F
    from rcspark.datapipe import text as tx

    rows = QUERIES["doc_winnow_fingerprint"](spark, SF_DIR).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.sel_pos)
    # winnowing guarantee: in every full window of W consecutive shingle
    # positions there is at least one selected position
    docs = load(spark, SF_DIR, "documents")
    np_by_doc = {
        r.doc_id: r.np
        for r in docs.select(
            "doc_id", F.size(tx.shingles(tx.tokens(F.col("text")))).alias("np")
        ).collect()
    }
    for doc_id, sels in list(by_doc.items())[:50]:
        sset = set(sels)
        npos = np_by_doc[doc_id]
        for w0 in range(1, npos - _WINNOW_W + 2):
            assert any(p in sset for p in range(w0, w0 + _WINNOW_W)), (
                doc_id, w0)


def test_harvest_only_planted_docs(spark):
    rows = QUERIES["doc_harvest_urls"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.doc_id % 4 == 0
        assert r.url_canon.startswith("http://site")
        assert "utm" not in r.url_canon and "HTTP" not in r.url_canon
        assert 0 <= r.shard < 32
    # two planted links per planted doc
    from collections import Counter
    c = Counter(r.doc_id for r in rows)
    assert set(c.values()) == {2}


def test_ann_recall_monotone(spark):
    rows = QUERIES["emb_ann_recall"](spark, SF_DIR).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, {})[r.k] = r
    for probe, ks in by_probe.items():
        assert set(ks) == {1, 3, 5}
        # hits can't exceed k and recall is a valid ppm
        for k, r in ks.items():
            assert 0 <= r.n_hits <= k
            assert r.recall_ppm == 1_000_000 * r.n_hits // k
        # hit count is monotone in k (top-k sets are nested)
        assert ks[1].n_hits <= ks[3].n_hits <= ks[5].n_hits


def test_dominant_color_share_bounds(spark):
    rows = QUERIES["img_dominant_color"](spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r.dom_bin < 64
        # dominant bin of 64 bins: share must be >= 1/64 of pixels
        assert r.dom_count * 64 >= r.n_pixels
        assert r.share_ppm == 1_000_000 * r.dom_count // r.n_pixels


# -- batch 15 -----------------------------------------------------------------


def test_blocklist_flags_planted_docs(spark):
    rows = QUERIES["doc_term_blocklist"](spark, SF_DIR).collect()
    for r in rows:
        if r.doc_id % 11 == 0:
            assert r.blocked and len(r.matched) >= 1
        else:
            assert not r.blocked and r.matched == []


def test_ohlc_bar_invariants(spark):
    rows = QUERIES["events_ohlc_hourly"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.low_c <= r.open_c <= r.high_c
        assert r.low_c <= r.close_c <= r.high_c
        assert r.n >= 1
        if r.n == 1:
            assert r.open_c == r.close_c == r.high_c == r.low_c


def test_maxsim_self_group_wins(spark):
    rows = {r.label: r for r in QUERIES["emb_maxsim_groups"](spark, SF_DIR).collect()}
    assert set(rows) == set(range(10))
    n_probes = {r.n_probes for r in rows.values()}
    assert len(n_probes) == 1
    np_ = n_probes.pop()
    # probes come from label 0: the self group contains every probe, so
    # each max is exactly 1.0 (1e6 micro) and the self score is maximal
    assert rows[0].maxsim_micro == np_ * 1_000_000
    assert all(rows[0].maxsim_micro >= r.maxsim_micro for r in rows.values())


# -- batch 16 -----------------------------------------------------------------


def test_snapshot_diff_classes(spark):
    rows = QUERIES["warehouse_snapshot_diff"](spark, SF_DIR).collect()
    assert {r.change_type for r in rows} == {"added", "removed", "changed"}
    for r in rows:
        if r.change_type == "added":
            assert r.old_cents is None and r.k % 5 == 0 and r.k % 7 != 0
        elif r.change_type == "removed":
            assert r.new_cents is None and r.k % 7 == 0 and r.k % 5 != 0
        else:
            assert r.new_cents - r.old_cents == 100 and r.k % 3 == 0


def test_percentile_cont_ordering(spark):
    rows = {r.p: r for r in QUERIES["agg_percentile_cont"](spark, SF_DIR).collect()}
    assert set(rows) == {50, 90, 99}
    assert rows[50].value_c100 <= rows[90].value_c100 <= rows[99].value_c100
    for r in rows.values():
        assert r.value_c100 >= 0 and r.n > 0


def test_equalize_stretches_range(spark):
    rows = QUERIES["img_histogram_equalize"](spark, SF_DIR).collect()
    for r in rows:
        # equalization maps the occupied range onto [0, 765]
        assert r.hi_out == 765
        assert 0 <= r.lo_in <= r.hi_in <= 765
        assert 0 < r.eq_sum <= 765 * r.n_pixels


# -- batch 17 -----------------------------------------------------------------


def test_iqr_outliers_beyond_fences(spark):
    rows = QUERIES["events_outlier_iqr"](spark, SF_DIR).collect()
    for r in rows:
        assert r.is_outlier
        fence = 3 * (r.q3 - r.q1)
        assert r.cents < r.q1 - fence or r.cents > r.q3 + fence


def test_shard_assign_epochs_permute(spark):
    rows = QUERIES["doc_shard_assign"](spark, SF_DIR).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = (r.shard, r.pos)
    assert set(by_epoch) == {0, 1}
    assert set(by_epoch[0]) == set(by_epoch[1])  # same docs each epoch
    # epoch salt must actually permute: assignments differ for most docs
    moved = sum(
        1 for d in by_epoch[0] if by_epoch[0][d] != by_epoch[1][d]
    )
    assert moved > len(by_epoch[0]) // 2
    # positions within (epoch, shard) are 1..size with no gaps
    from collections import defaultdict
    per_shard = defaultdict(list)
    for d, (s, p) in by_epoch[0].items():
        per_shard[s].append(p)
    for s, ps in per_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_fk_check_counts_planted_orphans(spark):
    (r,) = QUERIES["table_fk_check"](spark, SF_DIR).collect()
    assert r.n_orphans > 0
    assert r.orphan_ppm == 1_000_000 * r.n_orphans // r.n_child
    # orphans are exactly the planted % 13 rows
    from rcspark.queries import load
    from pyspark.sql import functions as F
    orders = load(spark, SF_DIR, "orders")
    planted = orders.filter(F.col("o_orderkey") % 13 == 0).count()
    assert r.n_orphans == planted


# -- batch 18 -----------------------------------------------------------------


def test_yield_boost_cap_and_rate(spark):
    rows = QUERIES["crawl_yield_reprioritize"](spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r.yield_permille <= 1000
        assert r.priority_boost == min(r.yield_permille // 100, 5)
        assert r.n_items <= r.n_fetched


def test_binary_sign_agrees_with_cosine_direction(spark):
    rows = QUERIES["emb_binary_sign_topk"](spark, SF_DIR).collect()
    by_probe = {}
    for r in rows:
        assert 0 <= r.hamming <= 64
        by_probe.setdefault(r.probe_id, []).append(r)
    for probe, hits in by_probe.items():
        ranked = sorted(hits, key=lambda r: r.rnk)
        hams = [r.hamming for r in ranked]
        assert hams == sorted(hams)


def test_dau_wau_bounds(spark):
    rows = QUERIES["events_dau_wau"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # a day's actives are a subset of its trailing week's actives
        assert 0 < r.dau <= r.wau
        assert r.stickiness_ppm == 1_000_000 * r.dau // r.wau
