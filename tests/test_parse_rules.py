"""Extraction rules as data (SURVEY A14 mandate): a per-host rule table
drives parse_page_with_rules; two hosts serving different markup must both
extract correctly, and an unconfigured host falls back to DEFAULT_RULES."""

from __future__ import annotations

from pyspark.sql import functions as F

from rcspark.parse import parse_page_with_rules


def test_two_hosts_different_rules_and_default_fallback(spark):
    pages = spark.createDataFrame(
        [
            (
                "a.example",
                b'<title>capA</title>\n<img src="http://a.example/i.ppm">\n'
                b'<a href="http://a.example/1">l</a>\n<a href="http://a.example/2">l</a>',
            ),
            (
                "b.example",
                b"cap:capB|img:http://b.example/i.ppm"
                b"|link:http://b.example/1|link:http://b.example/2",
            ),
            (
                "c.example",  # no rule row -> DEFAULT_RULES (HTML) fallback
                b'<title>capC</title>\n<a href="http://c.example/1">l</a>',
            ),
        ],
        "host string, body binary",
    )
    rules = spark.createDataFrame(
        [("b.example", r"link:([^|]*)", r"img:([^|]*)", r"cap:([^|]*)")],
        "host string, link_re string, image_re string, caption_re string",
    )
    out = {
        r["host"]: r
        for r in parse_page_with_rules(pages, rules)
        .select("host", "p.links", "p.image_url", "p.caption")
        .collect()
    }
    assert out["a.example"]["caption"] == "capA"
    assert out["a.example"]["links"] == ["http://a.example/1", "http://a.example/2"]
    assert out["a.example"]["image_url"] == "http://a.example/i.ppm"
    assert out["b.example"]["caption"] == "capB"
    assert out["b.example"]["links"] == ["http://b.example/1", "http://b.example/2"]
    assert out["b.example"]["image_url"] == "http://b.example/i.ppm"
    assert out["c.example"]["caption"] == "capC"
    assert out["c.example"]["links"] == ["http://c.example/1"]
    assert out["c.example"]["image_url"] is None
