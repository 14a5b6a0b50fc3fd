"""Semantic properties of the round-5 batch-39 operators — the
acquisition/compliance plane:

- crawl_ai_optout: RFC 9309 group REPLACEMENT (an exact agent group drops
  the wildcard group's Crawl-delay too), longest-match allow-wins on the
  probe path, Sitemap:/comment lines never split group accumulation.
- doc_license_detect: SPDX id normalization + NC/ND/SA permission bits.
- img_alt_text_mine: first-failing-gate order, URL resolution forms, and
  the positional alignment of the four attribute arrays through sort +
  extract (the zip is only correct if both engines keep order).
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES
from rcspark.robots import parse_robots_txt

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch39")


def test_parse_robots_matched_group_kinds():
    body = (
        "# comment\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Crawl-delay: 3\n"
        "Sitemap: https://x.example/sitemap.xml\n"
        "User-agent: GPTBot\n"
        "Disallow: /\n"
    )
    star = parse_robots_txt(body, "somebot")
    assert star["matched"] == "wildcard"
    assert star["crawl_delay"] == 3.0
    assert star["deny_rules"] == ["/private/"]
    gpt = parse_robots_txt(body, "GPTBot")
    assert gpt["matched"] == "exact"
    # group REPLACEMENT: the exact group has no Crawl-delay, and the
    # wildcard group's delay must NOT leak in
    assert gpt["crawl_delay"] is None
    assert gpt["deny_rules"] == ["/"]
    none = parse_robots_txt("User-agent: OtherBot\nDisallow: /\n", "x")
    assert none["matched"] == "none"
    assert none["deny_rules"] == []


def test_ai_optout_matrix_laws(spark):
    rows = QUERIES["crawl_ai_optout"](spark, SF_DIR).collect()
    assert rows
    by = {(r.host, r.agent): r for r in rows}
    hosts = {r.host for r in rows}
    assert len(rows) == 4 * len(hosts)
    seen_replacement = seen_allow_wins = seen_wild_deny = False
    for r in rows:
        k = int(r.host[1:])
        if r.agent == "gptbot":
            assert r.opt_out == (k % 2 == 0)
        if r.agent == "claudebot":
            # scoped group: root never denied for claudebot
            assert not r.opt_out
            if k % 3 == 1:
                assert r.matched_group == "exact"
                # allow-wins: /images/public/ (len 15) beats /images/ (8)
                assert r.probe_allowed
                seen_allow_wins = True
        if r.matched_group == "exact":
            # RFC 9309 replacement: exact groups carry no delay here, so
            # the wildcard group's Crawl-delay must never leak in
            assert r.crawl_delay_ms is None
            if k % 7 == 1:
                seen_replacement = True
        else:
            assert r.matched_group == "wildcard"
            if k % 7 == 1:
                assert r.crawl_delay_ms == (k % 5 + 1) * 1000
            else:
                assert r.crawl_delay_ms is None
            if k % 11 == 0:
                assert not r.probe_allowed
                seen_wild_deny = True
    assert seen_replacement and seen_allow_wins and seen_wild_deny
    # spot-check one full host row set against the python parser truth
    any_host = sorted(hosts)[0]
    assert {by[(any_host, a)].agent for a in
            ("gptbot", "ccbot", "claudebot", "google-extended")}


def test_license_detect_bits(spark):
    rows = QUERIES["doc_license_detect"](spark, SF_DIR).collect()
    assert rows
    seen = {None: 0, "cc0": 0, "nc": 0, "nd": 0, "free": 0}
    for r in rows:
        k = r.doc_id
        if k % 4 == 3:
            assert r.license_id is None
            assert not (r.allows_commercial or r.allows_derivatives
                        or r.share_alike or r.rel_license)
            seen[None] += 1
        elif k % 4 == 2:
            assert r.license_id == "CC0-1.0"
            assert r.allows_commercial and r.allows_derivatives
            assert not r.share_alike
            seen["cc0"] += 1
        else:
            lic = ("by", "by-sa", "by-nc", "by-nc-sa", "by-nd", "by-nc-nd")[k % 6]
            ver = ("2.0", "3.0", "4.0")[k % 3]
            assert r.license_id == f"CC-{lic.upper()}-{ver}"
            assert r.allows_commercial == ("nc" not in lic)
            assert r.allows_derivatives == ("nd" not in lic)
            assert r.share_alike == ("sa" in lic)
            assert r.rel_license == (k % 4 == 0)
            seen["nc" if "nc" in lic else ("nd" if "nd" in lic else "free")] += 1
    assert all(v > 0 for v in seen.values())


def test_alt_text_mine_gates(spark):
    df = QUERIES["img_alt_text_mine"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    reasons = {}
    for r in rows:
        k = int(r.img_url.rsplit("/", 1)[1].split(".")[0])
        # URL resolution forms
        if k % 5 == 0:
            assert r.img_url.startswith("http://cdn")
        elif k % 5 == 1:
            assert r.img_url == f"http://cdn.example/img/{k}.jpg"
        else:
            assert r.img_url == f"http://{r.host}.example/img/{k}.jpg"
        # gate truth re-derived independently
        w, h = 32 + k * 7 % 2000, 32 + k * 11 % 1400
        assert (r.w, r.h) == (w, h)
        alt = ("", "image", f"IMG_{k}", "pic")[k % 7] if k % 7 < 4 else r.caption
        expect = None
        if alt.strip() == "":
            expect = "no_alt"
        elif alt.strip().lower() in ("image", "photo", "logo", "icon",
                                     "banner", "spacer", "img", "thumbnail"):
            expect = "stop_caption"
        elif alt.strip().lower().startswith("img_"):
            expect = "filename_caption"
        elif len(alt.strip()) < 5:
            expect = "too_short"
        elif min(w, h) < 64:
            expect = "too_small"
        elif max(w, h) > 3 * min(w, h):
            expect = "extreme_aspect"
        assert r.reject_reason == expect, (k, alt, r.reject_reason, expect)
        assert r.accepted == (expect is None)
        reasons[r.reject_reason] = reasons.get(r.reject_reason, 0) + 1
    # every gate class occurs, and some pairs survive
    for cls in (None, "no_alt", "stop_caption", "filename_caption",
                "too_short", "too_small", "extreme_aspect"):
        assert reasons.get(cls, 0) > 0, (cls, reasons)


def test_alt_text_mine_plan_single_fixture_exchange(spark):
    """The parse/gate path is map-side: the ONLY shuffle is the fixture's
    page-assembly groupBy. A second exchange would mean the explode or the
    gates introduced one — pin it out."""
    df = QUERIES["img_alt_text_mine"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 1, plan
    assert "Exchange SinglePartition" not in plan
    assert "Generate" in plan


def test_alt_text_mine_plan_parse_runs_once(spark):
    """The Generate-sibling gotcha, filter flavor: posexplode inserts an
    implicit size(z)>0 Filter; if z is a projected expression rather than
    an aggregate OUTPUT ATTRIBUTE, projection collapse inlines the four
    regexp_extract_all into BOTH the Filter and the Project and every page
    body is regex-scanned twice. Pin: the full formatted plan carries each
    regex exactly once (all four inside the aggregate's Results)."""
    df = QUERIES["img_alt_text_mine"](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    formatted = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
    assert formatted.count("regexp_extract_all") == 4, formatted
    # and the Generate's pruning filter references an attribute, not the parse
    filt = [ln for ln in formatted.splitlines() if ln.startswith("Condition")]
    assert filt and all("regexp_extract_all" not in ln for ln in filt), filt
