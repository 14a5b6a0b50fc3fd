"""Semantic properties of the round-4 batch-27 operators — invariants the
rows+schema+hash oracles can't state: hard-negative mining verified by an
independent numpy brute force within the bucket, PNG text-chunk CRC tamper
detection + compressed-iTXt + Latin-1 paths, and the gray-world gate's
production (>1.2) semantics on planted tinted images."""

import zlib

import numpy as np
import pytest

from rcspark.codecs import encode_ppm
from rcspark.datapipe.multimodal import (
    color_cast_gate,
    extract_png_text,
    plant_png_text,
)
from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch27")


# -- emb_hard_negative_mine -----------------------------------------------------


def test_hard_negative_mine_brute_force(spark):
    import pandas as pd  # noqa: F401

    rows = QUERIES["emb_hard_negative_mine"](spark, SF_DIR).collect()
    assert rows and all(r.img_id % 2 == 0 for r in rows)
    assert all(r.txt_id == r.img_id ^ 1 for r in rows)
    mined = [r for r in rows if r.mined]
    assert mined, "some bucket must hold a foreign caption"
    for r in mined:
        assert r.hard_neg_id % 2 == 1 and r.hard_neg_id != r.txt_id
        assert r.margin == pytest.approx(
            round(r.true_sim - r.hard_neg_sim, 6), abs=0
        )
    # independent numpy verification: recompute buckets + argmax cosine
    # for every mined image and confirm the election
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .toPandas()
        .set_index("vec_id")["embedding"]
    )
    from rcspark.datapipe.similarity import NPLANES, plane_weight_py

    planes = np.array(
        [[plane_weight_py(p, d) for d in range(64)] for p in range(NPLANES)]
    )

    def bucket(v):
        proj = planes @ np.asarray(v, dtype=np.float64)
        return int(sum(1 << p for p in range(NPLANES) if proj[p] > 0))

    def cos(a, b):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        return round(float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b))), 6)

    by_bucket: dict[int, list[int]] = {}
    for vid, v in emb.items():
        if vid % 2 == 1:
            by_bucket.setdefault(bucket(v), []).append(vid)
    checked = 0
    for r in rows:
        cands = [
            t
            for t in by_bucket.get(bucket(emb[r.img_id]), [])
            if t != r.txt_id
        ]
        if not cands:
            assert not r.mined and r.hard_neg_id is None
            continue
        best = max((cos(emb[r.img_id], emb[t]), t) for t in cands)
        assert r.mined and (r.hard_neg_sim, r.hard_neg_id) == best
        checked += 1
    assert checked == len(mined)


# -- img_png_text_chunks ----------------------------------------------------------


def test_png_text_crc_tamper_detected():
    data = bytearray(plant_png_text(42))
    # flip one byte inside the Title tEXt payload (search past IDAT)
    pos = bytes(data).index(b"tEXt") + 10
    data[pos] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        extract_png_text(bytes(data))


def test_png_text_compressed_itxt_and_latin1():
    import struct

    from rcspark.png import _chunk, encode_png

    pix = np.zeros((4, 4, 3), dtype=np.uint8)
    base = encode_png(pix)
    body = "déjà vu — compressed caption".encode("utf-8")
    itxt = _chunk(
        b"iTXt", b"Comment\x00\x01\x00fr\x00\x00" + zlib.compress(body)
    )
    text = _chunk(b"tEXt", b"Auteur\x00" + "café".encode("latin-1"))
    rows = extract_png_text(base[:-12] + itxt + text + base[-12:])
    assert ("iTXt", "Comment", "fr", "déjà vu — compressed caption") in rows
    assert ("tEXt", "Auteur", "", "café") in rows
    # struct is imported to assert the unknown-method guard path raises
    bad = _chunk(b"iTXt", b"K\x00\x01\x09fr\x00\x00" + zlib.compress(b"x"))
    with pytest.raises(ValueError, match="method"):
        extract_png_text(base[:-12] + bad + base[-12:])
    assert struct.unpack(">I", base[8:12])[0] == 13  # IHDR length sanity


def test_png_text_query_gate(spark):
    rows = QUERIES["img_png_text_chunks"](spark, SF_DIR).collect()
    by_kw = {}
    for r in rows:
        by_kw.setdefault(r.keyword, []).append(r)
    assert set(by_kw) == {"Title", "Comment", "Software", "Description"}
    assert all(not r.is_caption for r in by_kw["Software"])
    assert all(r.is_caption for kw in ("Title", "Comment", "Description")
               for r in by_kw[kw])
    assert all(r.lang == "en" for r in by_kw["Description"])
    assert all("—" in r.text for r in by_kw["Description"])  # utf-8 survived


# -- img_color_cast ---------------------------------------------------------------


def test_color_cast_production_semantics(spark):
    neutral = np.full((8, 8, 3), 100, dtype=np.uint8)
    tinted = neutral.copy()
    tinted[:, :, 0] = 150  # r = 1.5 × g — an unambiguous red cast
    dark_blue = neutral.copy()
    dark_blue[:, :, 2] = 0  # zero-sum channel exercises the min guard
    df = spark.createDataFrame(
        [("neutral", encode_ppm(neutral)),
         ("tinted", encode_ppm(tinted)),
         ("darkblue", encode_ppm(dark_blue))],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in color_cast_gate(df, permille=1200).collect()}
    assert not out["neutral"].cast
    assert out["neutral"].cast_ratio_permille == 1000
    assert out["tinted"].cast and out["tinted"].dominant == "r"
    assert out["tinted"].cast_ratio_permille == 1500
    assert out["darkblue"].cast  # ratio vs max(min,1): huge, no crash
    assert out["darkblue"].cast_ratio_permille == 1000 * 100 * 64
