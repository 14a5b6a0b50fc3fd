"""Semantic properties of the round-4 batch-29 operators: the manifest's
first-failing-gate precedence + composition equality with the operators it
composes, and the WARC revisit invariant (revisit ⟺ digest unchanged vs the
previous capture, zero stored bytes)."""

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch29")


def test_manifest_precedence_and_composition(spark):
    rows = QUERIES["img_pair_manifest"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (r.bucket is None) == (not r.keep)
        assert (r.shard is None) == (not r.keep)
        assert r.keep == (r.reason == "ok")
        if r.shard is not None:
            assert 0 <= r.shard < 64
        # precedence: a caption failure masks later gates
        if r.caption in ("", "photo", "image", "img", "picture"):
            assert r.reason == "caption_blocked"
        elif not 3 <= r.n_cap_tokens <= 12:
            assert r.reason == "caption_len"
        elif min(r.w, r.h) < 32 or max(r.w, r.h) > 2 * min(r.w, r.h):
            assert r.reason == "dims"
    # composition: keep == img_caption_filter survivors minus cast images
    filt = {r.image_id for r in QUERIES["img_caption_filter"](spark, SF_DIR).collect()}
    cast = {r.image_id for r in QUERIES["img_color_cast"](spark, SF_DIR).collect()
            if r.cast}
    assert {r.image_id for r in rows if r.keep} == filt - cast
    assert {r.reason for r in rows} >= {"ok"}, "at least one pair must survive"


def test_cdx_revisit_invariant(spark):
    rows = QUERIES["crawl_cdx_revisit"](spark, SF_DIR).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    n_revisit = n_fresh = 0
    for url, caps in by_url.items():
        caps.sort(key=lambda r: r.wave)
        assert [c.wave for c in caps] == [1, 2, 3, 4]
        assert caps[0].record_type == "response"
        prev = caps[0].payload_digest
        for c in caps[1:]:
            if c.record_type == "revisit":
                assert c.payload_digest == prev and c.stored_bytes == 0
                n_revisit += 1
            else:
                assert c.payload_digest != prev and c.stored_bytes > 0
                n_fresh += 1
            prev = c.payload_digest
    assert n_revisit > 0 and n_fresh > 0, "both record types must occur"
