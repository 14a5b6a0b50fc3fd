"""Semantic properties of the round-5 batch-63 operators:

- source_csv_roundtrip: the decoded rows match the constructed hostile
  content (commas, doubled quotes, embedded newlines) — and a written
  part file parses with Python's stdlib csv module (RFC-4180 interop,
  a third parser beside Spark's writer/reader).
- doc_tokenize_offsets: spans are a lossless cover — for every word the
  pieces concatenated equal the word, each (start_in_word, piece_len)
  slice extracts its piece, spans are contiguous, and piece boundaries
  follow the registered merge table.
"""

from __future__ import annotations

import csv
import glob
import io
import tempfile

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch63")


def _expected_field(k: int) -> str:
    tail = {0: "\nnl", 1: ",x", 2: '"q"'}[k % 3]
    return f'v{k % 3},"{k}"{tail}'


def test_csv_roundtrip_and_stdlib_interop(spark):
    import duckdb

    from pyspark.sql import functions as F

    rows = QUERIES["source_csv_roundtrip"](spark, SF_DIR).collect()
    ks = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM '{SF_DIR}/orders.parquet'"
        ).fetchall()
    ]
    got = {r.k: r.field for r in rows}
    assert set(got) == set(ks)
    for k in ks:
        assert got[k] == _expected_field(k), k
    # stdlib interop: write the same frame and parse a part file with csv
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    kcol = F.col("o_orderkey")
    field = F.concat(
        F.lit("v"), (kcol % 3).cast("string"), F.lit(',"'),
        kcol.cast("string"), F.lit('"'),
        F.when(kcol % 3 == 0, F.lit("\nnl"))
        .when(kcol % 3 == 1, F.lit(",x"))
        .otherwise(F.lit('"q"')),
    )
    df = orders.select(kcol.cast("long").alias("k"), field.alias("field"))
    tmp = tempfile.mkdtemp(prefix="rcspark_csv_interop_")
    df.coalesce(1).write.mode("overwrite").option("header", True).option(
        "escape", '"'
    ).csv(tmp)
    part = glob.glob(f"{tmp}/part-*.csv")[0]
    with open(part, newline="") as f:
        rd = csv.DictReader(f)
        parsed = {int(r["k"]): r["field"] for r in rd}
    assert parsed == {k: _expected_field(k) for k in ks}


def test_tokenize_offsets_lossless_cover(spark):
    import re

    import duckdb

    rows = QUERIES["doc_tokenize_offsets"](spark, SF_DIR).collect()
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    by_word = {}
    for r in rows:
        by_word.setdefault((r.doc_id, r.word_idx), []).append(r)
    assert by_word
    multi = 0
    for (doc_id, wi), pieces in by_word.items():
        word = re.findall(r"[a-z0-9]+", texts[doc_id].lower())[wi - 1]
        pieces.sort(key=lambda r: r.piece_idx)
        assert "".join(p.piece for p in pieces) == word
        pos = 1
        for p in pieces:
            assert p.start_in_word == pos
            assert word[p.start_in_word - 1 : p.start_in_word - 1 + p.piece_len] == p.piece
            pos += p.piece_len
        if len(pieces) > 1:
            multi += 1
        # merged multi-char pieces only come from the registered table
        for p in pieces:
            if len(p.piece) > 1:
                assert p.piece in {
                    "th", "the", "an", "in", "er", "on", "re", "and"
                }
    assert multi > 0
