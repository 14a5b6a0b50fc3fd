"""Semantic properties of the round-5 batch-37 operators: proxy-rotation
bypass/strip laws, domain-scoped auth attach (the CVE-2021-41125 shape —
creds never leak to foreign hosts), and the method/body fingerprint audit
verified against hashlib. Plan pins: both dim joins must be broadcast."""

import base64
import hashlib

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch37")


def test_proxy_rotation_laws(spark):
    df = QUERIES["crawl_proxy_rotation"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    seen_bypass = seen_auth = seen_noauth = False
    for r in rows:
        is_no_proxy = (
            r.host.endswith(".internal.example") or r.host == "localhost"
        )
        assert r.bypass == is_no_proxy
        if r.bypass:
            seen_bypass = True
            assert r.proxy_url is None and r.proxy_auth is None
        else:
            assert r.proxy_url.startswith("http://proxy-r")
            # userinfo must be STRIPPED from the proxy URL
            assert "@" not in r.proxy_url
            slot = int(r.proxy_url.split("proxy-r")[1].split(".")[0])
            if slot % 2 == 0:
                seen_auth = True
                expect = base64.b64encode(f"u{slot}:p{slot}".encode()).decode()
                assert r.proxy_auth == f"Basic {expect}"
            else:
                seen_noauth = True
                assert r.proxy_auth is None
    assert seen_bypass and seen_auth and seen_noauth
    # the 5-row pool join must be broadcast, never a shuffle
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_http_auth_laws(spark):
    df = QUERIES["crawl_http_auth"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    seen_exact = seen_sub = seen_foreign = seen_nocred = False
    for r in rows:
        if r.host.endswith(".other-site.example"):
            # foreign host: Authorization must NEVER attach
            seen_foreign = True
            assert not r.attach and r.authorization is None
            continue
        # registrable domain of the fixture host is its last two labels
        dom = ".".join(r.host.split(".")[-2:])
        key = int(dom[1:].split(".")[0])
        has_cred = key % 3 != 2
        assert r.attach == has_cred
        if has_cred:
            expect = base64.b64encode(f"user{key}:tok{key}".encode()).decode()
            assert r.authorization == f"Basic {expect}"
            assert r.auth_domain == dom
            if r.host == dom:
                seen_exact = True
            else:
                seen_sub = True
        else:
            seen_nocred = True
            assert r.authorization is None
    assert seen_exact and seen_sub and seen_foreign and seen_nocred
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fingerprint_audit_vs_hashlib(spark):
    rows = QUERIES["crawl_fingerprint_audit"](spark, SF_DIR).collect()
    assert rows
    assert any(not r.url_key_complete for r in rows)  # planted POSTs occur
    assert any(r.url_key_complete for r in rows)
    for r in rows[:50]:
        body = f"q={r.o_orderkey}" if r.method == "POST" else ""
        assert r.url_key_complete == (r.method == "GET" and body == "")
        inner = hashlib.sha256(body.encode()).hexdigest()
        expect = hashlib.sha256(
            f"{r.method}\n{r.url_canon}\n{inner}".encode()
        ).hexdigest()
        assert r.fp_sha256 == expect
    # same URL, different method/body -> different fingerprint (the reason
    # the URL-only seen key is lossy for non-GET)
    post = next(r for r in rows if r.method == "POST")
    inner_get = hashlib.sha256(b"").hexdigest()
    fp_get = hashlib.sha256(
        f"GET\n{post.url_canon}\n{inner_get}".encode()
    ).hexdigest()
    assert post.fp_sha256 != fp_get
