"""Golden vectors + twin-parity for URL canonicalization (SURVEY.md A2)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rcspark.urlnorm import canon_col, canon_py

GOLDEN = [
    # (raw, canonical)
    ("HTTP://Site0.EXAMPLE/Path/a", "http://site0.example/Path/a"),
    ("http://site0.example", "http://site0.example/"),
    ("http://site0.example:80/x", "http://site0.example/x"),
    ("https://site0.example:443/x", "https://site0.example/x"),
    ("http://site0.example:8080/x", "http://site0.example:8080/x"),
    ("http://site0.example/x#frag", "http://site0.example/x"),
    ("http://site0.example/x?b=2&a=1", "http://site0.example/x?a=1&b=2"),
    (
        "http://site0.example/x?utm_source=t&b=2&ref=z&a=1&fbclid=q",
        "http://site0.example/x?a=1&b=2",
    ),
    ("http://site0.example/x?utm_campaign=c", "http://site0.example/x"),
    ("http://user:pw@site0.example/x", "http://site0.example/x"),
    ("  http://site0.example/x  ", "http://site0.example/x"),
    ("http://site0.example/x?a=1&a=0", "http://site0.example/x?a=0&a=1"),
    ("http://site0.example/x?&&a=1", "http://site0.example/x?a=1"),
    ("http://site0.example/x?refresh=1", "http://site0.example/x?refresh=1"),
]


def test_canon_py_golden():
    for raw, want in GOLDEN:
        assert canon_py(raw) == want, raw


def test_canon_py_invalid():
    assert canon_py("not a url") is None
    assert canon_py("/relative/only") is None


def test_canon_py_idempotent():
    for raw, _ in GOLDEN:
        c = canon_py(raw)
        assert canon_py(c) == c


def test_canon_col_matches_py(spark):
    rng = random.Random(7)
    urls = [raw for raw, _ in GOLDEN]
    # fuzz: generator-shaped URLs with noise
    for i in range(300):
        host = f"SiTe{rng.randint(0, 5)}.Example"
        path = "/" + "/".join(
            rng.choice(["p", "parts", "Motors", "x1"]) for _ in range(rng.randint(1, 3))
        )
        params = []
        for _ in range(rng.randint(0, 4)):
            params.append(
                rng.choice(["a=1", "b=2", "z=9", "utm_source=g", "ref=h", "id=%20x"])
            )
        q = ("?" + "&".join(params)) if params else ""
        frag = "#sec" if rng.random() < 0.3 else ""
        port = rng.choice(["", ":80", ":8080"])
        urls.append(f"http://{host}{port}{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canon_col(F.col("url")).alias("c")).collect()
    }
    for u in urls:
        assert got[u] == canon_py(u), f"twin mismatch for {u!r}"


def test_trap_features_golden(spark):
    """Golden vectors for the crawler-trap heuristics: each counter and
    the verdict precedence (params > repeat > depth)."""
    from rcspark.urlnorm import trap_features

    cases = [
        # url, depth, n_repeat, n_params, verdict
        ("http://h.example/", 0, 0, 0, "ok"),
        ("http://h.example/a/b/c", 3, 0, 0, "ok"),
        ("http://h.example/a/b/c/d/e/f/g/h", 8, 0, 0, "ok"),
        ("http://h.example/a/b/c/d/e/f/g/h/i", 9, 0, 0, "trap-depth"),
        ("http://h.example/a/a/b", 3, 1, 0, "ok"),
        ("http://h.example/x/a/a/a/a", 5, 3, 0, "trap-repeat"),
        # repeat beats depth: 9 segments, 8 of them the same
        ("http://h.example/" + "/".join(["s"] * 9), 9, 8, 0, "trap-repeat"),
        ("http://h.example/p?a=1&b=2", 1, 0, 2, "ok"),
        ("http://h.example/p?" + "&".join(f"k{i}=1" for i in range(8)), 1, 0, 8, "ok"),
        ("http://h.example/p?" + "&".join(f"k{i}=1" for i in range(9)), 1, 0, 9,
         "trap-params"),
        # params beats repeat AND depth
        ("http://h.example/" + "/".join(["s"] * 9) + "?"
         + "&".join(f"k{i}=1" for i in range(9)), 9, 8, 9, "trap-params"),
        # fragment is not part of the query
        ("http://h.example/p?a=1#b=2&c=3", 1, 0, 1, "ok"),
        # no query at all
        ("http://h.example/p#frag", 1, 0, 0, "ok"),
    ]
    from rcspark.urlnorm import trap_features as tf

    df = spark.createDataFrame([(u,) for u, *_ in cases], ["url"])
    feats = tf(F.col("url"))
    got = {
        r["url"]: (r["depth"], r["n_repeat"], r["n_params"], r["verdict"])
        for r in df.select(
            "url",
            feats["depth"].alias("depth"),
            feats["n_repeat"].alias("n_repeat"),
            feats["n_params"].alias("n_params"),
            feats["verdict"].alias("verdict"),
        ).collect()
    }
    for u, d, rep, par, v in cases:
        assert got[u] == (d, rep, par, v), f"trap mismatch for {u!r}: {got[u]}"
