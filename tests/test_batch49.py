"""Semantic properties of the round-5 batch-49 operators:

- stream_incremental_dedup: row-for-row equality with the batch query
  (the driver hash already pins it via the shared oracle; the pytest pin
  is belt-and-braces plus column order).
- crawl_tdm_reservation: channel precedence (wellknown rule beats header
  beats meta), location scoping (a wellknown rule only decides when its
  prefix matches the path), default not-reserved, policy URL only from
  the winning channel.
- img_bomb_gate: planted pixel bombs flag 'too_many_pixels', ratio bombs
  flag 'suspicious_ratio', normals admit; the gate never decodes (it
  runs on header dims alone — a stale IHDR CRC does not matter).
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch49")


def test_stream_equals_batch(spark):
    batch = QUERIES["doc_incremental_dedup"](spark, SF_DIR)
    stream = QUERIES["stream_incremental_dedup"](spark, SF_DIR)
    assert batch.columns == stream.columns
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, stream.collect()))
    assert b == s


def test_tdm_channel_precedence(spark):
    rows = QUERIES["crawl_tdm_reservation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        k = int(r.host[1:])
        wk_present = k % 5 == 0
        wk_applies = wk_present and (k % 4 in (0, 1))  # /images/ prefix paths
        hdr_present = k % 3 == 0
        meta_present = k % 2 == 0
        if wk_applies:
            assert r.channel == "wellknown"
            assert r.res_wellknown == (k % 10 == 0)
        elif hdr_present:
            assert r.channel == "header"
            assert r.res_wellknown is None
            assert r.res_header == (k % 6 == 0)
        elif meta_present:
            assert r.channel == "meta"
            assert r.res_meta == (k % 4 == 2)
        else:
            assert r.channel is None and not r.reservation
        # policy URL only from the winning, reserving channel
        if r.reservation and r.channel == "wellknown":
            assert r.policy_url == f"https://h{k}.example/tdmpolicy"
        elif r.reservation and r.channel == "header":
            assert r.policy_url == f"https://h{k}.example/hpolicy"
        else:
            assert r.policy_url is None
        assert r.url.startswith(r.host)


def test_bomb_gate_classes(spark):
    from rcspark.fixtures import BOMB_CLASSES

    rows = QUERIES["img_bomb_gate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        k = int(r.image_id[3:])
        kind = BOMB_CLASSES[(k // 25) % 3]
        if kind == "normal":
            assert r.admitted and r.flag_reason is None
            assert r.pixels == r.w * r.h <= 64 * 64
        elif kind == "pixel_bomb":
            assert r.flag_reason == "too_many_pixels"
            assert r.pixels > 50_000_000
        else:
            assert r.flag_reason == "suspicious_ratio"
            assert r.pixels <= 50_000_000
            assert r.pixels * 3 > 1000 * r.nbytes
        assert r.admitted == (r.flag_reason is None)


def test_bomb_fixture_is_still_a_real_png_container():
    # the patch must only touch declared dims — magic + IHDR tag intact,
    # container length unchanged vs the unpatched class
    from rcspark.fixtures import make_bomb_arrival

    a = make_bomb_arrival("imgZ", 0)
    b = make_bomb_arrival("imgZ", 1)
    assert a[:8] == b[:8] == b"\x89PNG\r\n\x1a\n"
    assert a[12:16] == b[12:16] == b"IHDR"
    assert len(a) == len(b)
    assert a[24:] == b[24:]  # only the dim fields differ
