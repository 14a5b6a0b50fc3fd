"""Semantic properties of the round-5 batch-64 operators:

- doc_pack_boundaries: segments are a gapless tiling — within each lang
  stream, per-bin segments cover [0, seq_len) without gaps or overlaps
  (except the final partial bin), each doc's seg_len sum equals its
  token count, and is_split marks exactly the straddlers.
- events_ab_cuped: theta and the adjusted means re-derived in exact
  Python integers from the parquet; CUPED reduces (or preserves)
  cross-user variance of the adjusted metric vs the raw metric.
"""

from __future__ import annotations

import re

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
SEQ_LEN = 4096  # _PACK_SEQ_LEN


@pytest.fixture(scope="module")
def spark():
    from rcspark.queries import _PACK_SEQ_LEN

    assert _PACK_SEQ_LEN == SEQ_LEN
    from rcspark.session import get_spark

    return get_spark("test_batch64")


def test_pack_boundaries_tile(spark):
    rows = QUERIES["doc_pack_boundaries"](spark, SF_DIR).collect()
    by_doc = {}
    by_stream_bin = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        by_stream_bin.setdefault((r.lang, r.bin), []).append(r)
    import duckdb

    toks = {
        d: len(re.findall(r"[a-z0-9]+", t.lower()))
        for d, t in duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    }
    n_split = 0
    for d, segs in by_doc.items():
        assert sum(s.seg_len for s in segs) == toks[d]
        assert all(s.seg_len > 0 for s in segs)
        if len(segs) > 1:
            n_split += 1
            assert all(s.is_split for s in segs)
        else:
            assert not segs[0].is_split
    assert n_split > 0
    # gapless tiling per (lang, bin): sorted segments abut; full bins
    # cover exactly [0, SEQ_LEN)
    for (lang, b), segs in by_stream_bin.items():
        segs.sort(key=lambda s: s.start_in_bin)
        pos = 0
        for s in segs:
            assert s.start_in_bin == pos, (lang, b, s)
            pos += s.seg_len
        assert pos <= SEQ_LEN
        last_bin = max(bb for (ll, bb) in by_stream_bin if ll == lang)
        if b < last_bin:
            assert pos == SEQ_LEN  # interior bins are full


def test_cuped_python_twin_and_variance(spark):
    import duckdb

    pre, post = {}, {}
    for uid, ts, val in duckdb.sql(
        f"SELECT user_id, ts, value FROM '{SF_DIR}/events.parquet'"
    ).fetchall():
        d = int(val + 0.5)  # half-away for non-negative, matches engine round()
        side = pre if ts.strftime("%Y-%m-%d") < "2024-01-16" else post
        side[uid] = side.get(uid, 0) + d
    users = sorted(set(pre) | set(post))
    px = [pre.get(u, 0) for u in users]
    py = [post.get(u, 0) for u in users]
    n = len(users)
    sx, sy = sum(px), sum(py)
    sxx = sum(x * x for x in px)
    sxy = sum(x * y for x, y in zip(px, py))

    def tdiv(a, b):  # truncating div, matches both engines
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    theta = tdiv((n * sxy - sx * sy) * 1000, n * sxx - sx * sx)
    mean_pre_milli = tdiv(sx * 1000, n)
    rows = {r.arm: r for r in QUERIES["events_ab_cuped"](spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    adj = {
        u: post.get(u, 0) * 1000000
        - theta * (pre.get(u, 0) * 1000 - mean_pre_milli)
        for u in users
    }
    for arm in (0, 1):
        arm_users = [u for u in users if u % 2 == arm]
        r = rows[arm]
        assert r.n_users == len(arm_users)
        assert r.theta_milli == theta
        assert r.mean_post_micro == tdiv(
            sum(post.get(u, 0) for u in arm_users) * 1000000, len(arm_users)
        )
        assert r.mean_adj_micro == tdiv(
            sum(adj[u] for u in arm_users), len(arm_users)
        )
    # CUPED's point: adjusted variance <= raw variance (theta optimal
    # up to milli rounding)
    my = sum(py) / n
    var_raw = sum((y * 1e6 - my * 1e6) ** 2 for y in py) / n
    ma = sum(adj.values()) / n
    var_adj = sum((a - ma) ** 2 for a in adj.values()) / n
    assert var_adj <= var_raw * 1.001
