"""Independent punycode/IDN twin — spec-forward RFC 3492, no stdlib codec.

The engine folds IDN hosts with Python's built-in `idna` codec
(rcspark/urlnorm.py idna_host); this twin re-implements the punycode
encoder from the RFC's pseudo-code (generalized variable-length integers
with bias adaptation) so the expected parquet the DuckDB oracle joins is
derived by a genuinely different implementation. Fixture labels are
chosen nameprep-neutral (already lowercase, no mapped codepoints), so
lowercase + punycode is the complete transform on both sides.

Usage: python scripts/idn_twin.py  → rewrites tests/data/idn_expected.parquet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE, TMIN, TMAX = 36, 1, 26
SKEW, DAMP = 38, 700
INITIAL_BIAS, INITIAL_N = 72, 128


def _digit(d: int) -> str:
    return chr(ord("a") + d) if d < 26 else chr(ord("0") + d - 26)


def _adapt(delta: int, numpoints: int, first: bool) -> int:
    delta = delta // DAMP if first else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:
        delta //= BASE - TMIN
        k += BASE
    return k + (((BASE - TMIN + 1) * delta) // (delta + SKEW))


def punycode_encode(label: str) -> str:
    """RFC 3492 §6.3, transcribed from the spec pseudo-code."""
    cps = [ord(c) for c in label]
    out = [c for c in label if ord(c) < 128]
    b = h = len(out)
    if out:
        out.append("-")
    n, delta, bias = INITIAL_N, 0, INITIAL_BIAS
    while h < len(cps):
        m = min(c for c in cps if c >= n)
        delta += (m - n) * (h + 1)
        n = m
        for c in cps:
            if c < n:
                delta += 1
            elif c == n:
                q = delta
                k = BASE
                while True:
                    t = TMIN if k <= bias else (TMAX if k >= bias + TMAX else k - bias)
                    if q < t:
                        break
                    out.append(_digit(t + (q - t) % (BASE - t)))
                    q = (q - t) // (BASE - t)
                    k += BASE
                out.append(_digit(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def twin_idna_host(host: str) -> str:
    labels = []
    for lab in host.lower().split("."):
        if all(ord(c) < 128 for c in lab):
            labels.append(lab)
        else:
            labels.append("xn--" + punycode_encode(lab))
    return ".".join(labels)


# nameprep-neutral fixture labels (already lowercase, unmapped codepoints)
IDN_LABELS = (
    "plain", "münchen", "bücher", "café", "örebro",
    "例え", "ドメイン", "пример", "köln", "naïve",
)
IDN_TLDS = ("com", "co.uk", "jp", "org")
MAX_PARTKEY = 20000


def host_for(k: int) -> str:
    lab = IDN_LABELS[(k // 10 + k) % len(IDN_LABELS)]
    return f"{lab}{k % 7}.{IDN_TLDS[k % len(IDN_TLDS)]}"


def main() -> None:
    import pandas as pd

    rows = []
    for k in range(0, MAX_PARTKEY, 10):
        h = host_for(k)
        a = twin_idna_host(h)
        rows.append((k, a, a != h))
    pdf = pd.DataFrame(rows, columns=["k", "host_ascii", "is_idn"])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "idn_expected.parquet",
    )
    pdf.to_parquet(out, index=False)
    print(f"{out}: {len(pdf)} rows, {int(pdf.is_idn.sum())} idn")


if __name__ == "__main__":
    main()
