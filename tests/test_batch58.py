"""Semantic properties of the round-5 batch-58 operators:

- crawl_jsonld_captions: real JSON decoding is exercised — captions come
  back with the escaped quote and the \\u00e9 unicode escape DECODED;
  Organization blocks and the non-LD <script> decoy never leak through.
- agg_unpivot_events: the unpivoted long grid is dense (every user ×
  all 5 event types) and re-aggregating it reproduces the direct
  groupBy counts exactly (pivot→unpivot is lossless + zero-filled).
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch58")


def test_jsonld_escape_decode_and_type_filter(spark):
    rows = QUERIES["crawl_jsonld_captions"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ks = {r.o_orderkey for r in orders.select("o_orderkey").collect()}
    want = {k for k in ks if k % 3 != 0}
    got = {int(r.img_url.rsplit("/", 1)[1][:-4]) for r in rows}
    assert got == want  # Organization pages (k%3==0) filtered out
    for r in rows:
        k = int(r.img_url.rsplit("/", 1)[1][:-4])
        assert r.caption == f'part "{k}" étude {k % 7}'  # \" and é decoded
        assert r.w_px == 200 + k % 800


def test_unpivot_dense_grid_roundtrip(spark):
    from pyspark.sql import functions as F

    long = QUERIES["agg_unpivot_events"](spark, SF_DIR)
    rows = long.collect()
    users = {r.user_id for r in rows}
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, {})[r.event_type] = r.n_events
    types = {"click", "error", "purchase", "signup", "view"}
    for u in users:
        assert set(by_user[u]) == types  # dense grid
    direct = {
        (r.user_id, r.event_type): r.n
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for (u, t), n in direct.items():
        assert by_user[u][t] == n
    assert sum(v for d in by_user.values() for v in d.values()) == sum(
        direct.values()
    )
    # dense: exactly users × 5 rows, zero-filled wherever direct has no pair
    assert len(rows) == len(users) * 5
    for u in users:
        for t in types:
            if (u, t) not in direct:
                assert by_user[u][t] == 0
