"""Pure-Python + vectorized-numpy XXH64, bit-identical to Spark's builtin.

Spark's ``xxhash64(col)`` (seed 42) hashes a string column's UTF-8 bytes with
the public XXH64 algorithm and returns a SIGNED int64. The oracle simulator
(rcspark.oracle) and test audits need the same digest host-side; this module
provides it with zero dependencies. Parity with the Spark builtin is asserted
in tests/test_xxh.py over random strings.

Also provides splitmix64 (numpy-vectorized) used to derive the k Bloom bit
positions from an int64 digest (rcspark.dedup) — identical constants on the
build and probe sides.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of raw bytes → unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            k1 = int.from_bytes(data[i : i + 8], "little")
            k2 = int.from_bytes(data[i + 8 : i + 16], "little")
            k3 = int.from_bytes(data[i + 16 : i + 24], "little")
            k4 = int.from_bytes(data[i + 24 : i + 32], "little")
            v1 = (_rotl((v1 + k1 * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + k2 * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + k3 * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + k4 * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = ((h * _P1) + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_str(s: str, seed: int = 42) -> int:
    """Signed int64 digest of a string's UTF-8 bytes — equals Spark
    ``xxhash64(lit(s))`` with the default seed."""
    u = xxh64(s.encode("utf-8"), seed)
    return u - (1 << 64) if u >= (1 << 63) else u


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays (Bloom mixing)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z
