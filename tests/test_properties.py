"""Property-based tests (SURVEY.md §5.2.5) — pure Python, hypothesis-driven.

These pin the algebraic contracts the engine's correctness rests on, without
spinning Spark: the Spark twins are asserted equal to these Python twins in
tests/test_urlnorm.py / test_xxh.py, so properties proven here transfer.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rcspark.constants import PER_HOST_CAP, WAVE_SECONDS
from rcspark.oracle import host_budget, host_delay_ms
from rcspark.urlnorm import canon_py

# URL generator: scheme://host[:port]/path[?query][#frag] with tracking noise
_host = st.from_regex(r"[A-Za-z0-9]{1,8}(\.[A-Za-z0-9]{1,6}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,6}){0,4}", fullmatch=True)
_key = st.one_of(
    st.from_regex(r"[a-z]{1,5}", fullmatch=True),
    st.sampled_from(["utm_source", "utm_medium", "ref", "fbclid", "gclid"]),
)
_kv = st.tuples(_key, st.from_regex(r"[A-Za-z0-9]{0,5}", fullmatch=True)).map(
    lambda t: f"{t[0]}={t[1]}"
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    q = draw(st.lists(_kv, max_size=4))
    frag = draw(st.sampled_from(["", "#top", "#s1"]))
    qs = ("?" + "&".join(q)) if q else ""
    return f"{scheme}://{host}{port}{path}{qs}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = canon_py(u)
    assert c is not None
    assert canon_py(c) == c  # canonical form is a fixed point


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_strips_what_it_promises(u):
    c = canon_py(u)
    assert "#" not in c
    assert "utm_" not in c and "fbclid" not in c and "gclid" not in c
    scheme, rest = c.split("://", 1)
    assert scheme == scheme.lower()
    hostport = rest.split("/", 1)[0]
    assert hostport == hostport.lower()
    # the scheme's OWN default port is stripped (https://h:80 keeps :80 —
    # hypothesis found that case; the strip is scheme-dependent by spec)
    default = {"http": ":80", "https": ":443"}[scheme]
    assert not hostport.endswith(default)


@given(st.lists(urls(), max_size=30), st.lists(urls(), max_size=30))
@settings(max_examples=100, deadline=None)
def test_dedup_commutes_with_union(xs, ys):
    # seen-set semantics: dedup(A ∪ B) == dedup(A) ∪ (dedup(B) − canon(A))
    ca = {canon_py(u) for u in xs}
    cb = {canon_py(u) for u in ys}
    assert (ca | cb) == ca | (cb - ca)


@given(st.floats(min_value=0.0, max_value=100.0, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_budget_bounds(delay):
    b = host_budget(delay)
    assert 1 <= b <= PER_HOST_CAP
    # the last scheduled fetch of the wave starts within the wave clock
    assert (b - 1) * host_delay_ms(delay) <= WAVE_SECONDS * 1000


# -- GIF codec properties (round 4) -------------------------------------------


@st.composite
def _small_images(draw):
    import numpy as np

    h = draw(st.integers(min_value=1, max_value=24))
    w = draw(st.integers(min_value=1, max_value=24))
    ncol = draw(st.integers(min_value=1, max_value=256))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, (h, w))]


@given(_small_images(), st.booleans())
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_property(img, interlace):
    """Any ≤256-color image (any size ≥1×1, any interlace flag)
    roundtrips losslessly through the real GIF codec, and the
    independent scalar twin decodes the same bytes to the same pixels."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    from rcspark.gif import decode_gif, encode_gif
    from scripts.gif_twin import twin_decode_gif

    data, mode = encode_gif(img, interlace=interlace)
    assert mode == "exact"
    dec = decode_gif(data)
    assert np.array_equal(dec, img)
    twin = np.array(twin_decode_gif(data), dtype=np.uint8).reshape(img.shape)
    assert np.array_equal(twin, img)


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_gif_truecolor_roundtrip_is_quantization(seed):
    import numpy as np

    from rcspark.gif import decode_gif, encode_gif, quantize_332

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    data, mode = encode_gif(img)
    want = img if mode == "exact" else quantize_332(img)
    assert np.array_equal(decode_gif(data), want)
