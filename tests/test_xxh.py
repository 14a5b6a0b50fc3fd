"""Parity of the pure-Python XXH64 with Spark's builtin xxhash64 (seed 42).

This digest is the frontier's identity (SURVEY.md A3) — any divergence
breaks seen-set equality, so parity is tested over adversarial lengths
(crossing the 4/8/32-byte chunk boundaries) and random unicode.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rcspark.xxh import xxh64_str


def test_xxh64_matches_spark(spark):
    rng = random.Random(42)
    urls = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "abcde" * 7,  # 35 bytes > 32
        "http://site0.example/p/1?a=1&b=2",
        "héllø/ünïcode✓" * 5,
    ]
    for n in (3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 100, 1000):
        urls.append("".join(chr(rng.randint(32, 0x2FFF)) for _ in range(n)))
    df = spark.createDataFrame([(u,) for u in urls], ["s"])
    got = {
        r["s"]: r["d"]
        for r in df.select("s", F.xxhash64("s").alias("d")).collect()
    }
    for u in urls:
        assert got[u] == xxh64_str(u), f"mismatch for {u!r}"
