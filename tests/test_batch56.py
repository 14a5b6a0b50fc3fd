"""Semantic properties of the round-5 batch-56 operators:

- rcspark/wav.py is REAL RIFF/WAVE: stdlib `wave` reads the engine's
  bytes sample-exact (with the LIST/INAM metadata chunk present), and the
  engine's chunk walker reads stdlib-written bytes; unknown chunks are
  skipped in any position; truncation raises instead of mis-spanning.
- audio_wav_riff: dominant_hz tracks the id-derived clip frequency to
  within one rFFT bin; titles follow the 'clip:<id>' law.
- crawl_sitemap_images: the synthesized per-host sitemap body is
  well-formed namespaced XML — xml.etree (a conforming parser, fully
  independent of the regex path) recovers EXACTLY the engine's
  (page, img_seq, img_loc, caption) rows, captions XML-unescaped.
"""

from __future__ import annotations

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest

from rcspark.queries import QUERIES
from rcspark.wav import decode_wav, encode_wav

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch56")


def _clip(seed: int, n: int = 1000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 5000).astype(np.int16)


def test_stdlib_wave_reads_engine_bytes():
    s = _clip(1)
    data = encode_wav(s, 8000, title="hello wav")  # odd-length title → pad
    with stdlib_wave.open(io.BytesIO(data)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == len(s)
        got = np.frombuffer(w.readframes(len(s)), dtype="<i2")
    assert np.array_equal(got, s)


def test_engine_reads_stdlib_bytes():
    s = _clip(2)
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(s.astype("<i2").tobytes())
    got, rate, title = decode_wav(buf.getvalue())
    assert rate == 16000 and title is None
    assert np.array_equal(got, s)


def test_unknown_chunk_skipped_and_truncation_raises():
    s = _clip(3)
    data = encode_wav(s, 8000, title="t")
    # splice a JUNK chunk (odd size → pad byte) right after the fmt chunk
    fmt_end = data.index(b"fmt ") + 8 + 16
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde\x00"
    spliced = data[:fmt_end] + junk + data[fmt_end:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", struct.unpack("<I", data[4:8])[0] + len(junk))
        + spliced[8:]
    )
    got, rate, title = decode_wav(spliced)
    assert np.array_equal(got, s) and title == "t"
    with pytest.raises(ValueError):
        decode_wav(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + data[4:])


def test_wav_riff_frequency_and_title_law(spark):
    from rcspark.xxh import xxh64

    rows = QUERIES["audio_wav_riff"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.title == f"clip:{r.audio_id}"
        freq = 100.0 + (xxh64(r.audio_id.encode()) % 1900)
        bin_hz = r.rate / r.n_samples  # one rFFT bin
        assert abs(r.dominant_hz - freq) <= bin_hz
        assert 0.3 < r.rms < 0.6  # 0.6/sqrt(2) ± noise


def test_sitemap_images_vs_conforming_xml_parser(spark):
    import xml.etree.ElementTree as ET

    from pyspark.sql import functions as F

    rows = QUERIES["crawl_sitemap_images"](spark, SF_DIR).collect()
    host = min(r.host for r in rows)
    engine = sorted(
        (r.page_loc, r.img_seq, r.img_loc, r.caption)
        for r in rows
        if r.host == host
    )
    # rebuild the same body the query parsed (same deterministic assembly)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    hn = int(host[1:])
    ks = sorted(
        r.o_orderkey
        for r in orders.filter(F.col("o_custkey") % 12 == hn).collect()
    )
    SM = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
    IM = "{http://www.google.com/schemas/sitemap-image/1.1}"
    entries = []
    for k in ks:
        imgs = "".join(
            f"<image:image><image:loc>http://cdn.h{hn}.example/im/{k}_{j}.jpg"
            f"</image:loc><image:caption>part {k * 3 + j} &amp; co "
            f"&quot;fine&quot;</image:caption></image:image>"
            for j in range(1 + k % 3)
        )
        entries.append(
            f"<url><loc>http://h{hn}.example/o/{k}</loc>{imgs}</url>"
        )
    body = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
        ' xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">'
        + "".join(sorted(entries))
        + "</urlset>"
    )
    expected = []
    for url in ET.fromstring(body).findall(f"{SM}url"):
        page = url.find(f"{SM}loc").text
        for i, im in enumerate(url.findall(f"{IM}image")):
            expected.append(
                (
                    page,
                    i + 1,
                    im.find(f"{IM}loc").text,
                    im.find(f"{IM}caption").text,  # ET unescapes entities
                )
            )
    assert engine == sorted(expected)
    assert any('"' in c and "&" in c for (_, _, _, c) in expected)
