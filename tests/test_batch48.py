"""Semantic properties of the round-5 batch-48 operators:

- emb_power_iteration: the engine's learned direction equals an
  independent pure-Python integer power iteration exactly (quantization,
  Chebyshev renorm, div-half-away); the Rayleigh quotient of the learned
  direction reaches >=0.8 of numpy's top eigenvalue and beats the random
  start vector (power-iteration law).
- img_header_probe: decode-free dims equal the generator ground truth
  for every frame-carrying class INCLUDING the truncated PNG (which
  img_media_quarantine routes 'corrupt' — the probe/quarantine contrast),
  while undecodable WebP stubs and garbage yield NULL dims; never raises
  on arbitrary bytes.
"""

from __future__ import annotations

import math

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch48")


def _python_power_iteration(X, iters=4):
    from rcspark.datapipe.similarity import _div_half_away, pca_v0

    v = pca_v0(64)
    for _ in range(iters):
        s = [sum(x[d] * v[d] for d in range(64)) for x in X]
        u = [sum(s[r] * X[r][d] for r in range(len(X))) for d in range(64)]
        m = max(abs(c) for c in u) or 1
        v = [_div_half_away(c * 1000, m) for c in u]
    return v


def _quant(x):
    v = float(x) * 1000.0
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def test_power_iteration_matches_python_twin_exactly(spark):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    X = [[_quant(c) for c in e] for e in t["embedding"]]
    v = _python_power_iteration(X)
    proj = {i: sum(x[d] * v[d] for d in range(64))
            for i, x in zip(t["vec_id"], X)}
    rows = QUERIES["emb_power_iteration"](spark, SF_DIR).collect()
    assert len(rows) == len(X)
    for r in rows:
        assert r.proj == proj[r.vec_id]
        assert r.side == (r.proj >= 0)


def test_power_iteration_rayleigh_dominates():
    import numpy as np
    import pyarrow.parquet as pq

    from rcspark.datapipe.similarity import pca_v0

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    X = [[_quant(c) for c in e] for e in t["embedding"]]
    Xf = np.array([[float(c) for c in e] for e in t["embedding"]])
    G = Xf.T @ Xf
    evals = np.linalg.eigvalsh(G)

    def rayleigh(v):
        vf = np.array(v, dtype=float)
        vf /= np.linalg.norm(vf)
        return float(vf @ G @ vf)

    v4 = _python_power_iteration(X)
    assert rayleigh(v4) >= 0.8 * evals[-1]
    assert rayleigh(v4) > rayleigh(pca_v0(64))


def test_header_probe_truth_and_quarantine_contrast(spark):
    from rcspark.fixtures import _ARRIVAL_CLASSES, make_smooth_image

    rows = QUERIES["img_header_probe"](spark, SF_DIR).collect()
    assert rows
    framed = {"png", "jpeg", "gif", "bmp", "webp_vp8l", "trunc_png"}
    quar = {r.image_id: r
            for r in QUERIES["img_media_quarantine"](spark, SF_DIR).collect()}
    saw_trunc = False
    for r in rows:
        k = int(r.image_id[3:])
        kind = _ARRIVAL_CLASSES[(k // 25) % len(_ARRIVAL_CLASSES)]
        if kind in framed:
            h, w = make_smooth_image(r.image_id).shape[:2]
            assert (r.probe_w, r.probe_h) == (w, h), (r, kind)
            assert r.dims_available
            if kind == "trunc_png":
                saw_trunc = True
                q = quar[r.image_id]
                assert not q.decode_ok and q.quarantine_reason == "corrupt"
        else:
            assert r.probe_w is None and r.probe_h is None
            assert not r.dims_available
    # sf0.001 has only 8 probe ids; the planted contrast class must appear
    # at sf>=0.01 — assert it there via the fixture directly if absent here
    if not saw_trunc:
        from rcspark.datapipe.multimodal import parse_image_header
        from rcspark.fixtures import make_mixed_arrival

        cls = _ARRIVAL_CLASSES.index("trunc_png")
        fmt, w, h = parse_image_header(make_mixed_arrival("imgX", cls))
        hh, ww = make_smooth_image("imgX").shape[:2]
        assert (fmt, w, h) == ("png", ww, hh)


def test_header_probe_never_raises_on_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rcspark.datapipe.multimodal import parse_image_header

    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def _fuzz(data):
        fmt, w, h = parse_image_header(data)
        assert isinstance(fmt, str)
        assert (w is None) == (h is None)

    _fuzz()
