"""Cross-engine deterministic hashing — the oracle-parity trick.

The driver checks every ``queries()`` entry against DuckDB (the oracle), so
any hash used in a checked operator must be computable *identically* in both
engines. Spark's ``xxhash64`` has no DuckDB twin, and DuckDB's ``hash()`` has
no Spark twin — but both engines agree on ``md5`` hex. ``digest60`` therefore
takes the first 15 hex chars of md5 (60 bits, always non-negative, fits
int64) and parses them to a BIGINT:

- Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)  :: long``
- DuckDB: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``

The *engine-internal* digest stays Spark's builtin ``xxhash64`` (seed 42,
JVM-side, zero Python — see rcspark.xxh for the audit twin); digest60 exists
for the oracle-checked datapipe operators (doc dedup, MinHash, SimHash,
fingerprints) where both engines must see the same bits.

Seeded variants (``digest60(seed || ':' || x)``) give the k independent
hash functions MinHash/LSH need — seeds are literal strings so the SQL twin
is mechanical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits < 2^63: always non-negative in both engines


def digest60(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative long (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, HEX_CHARS), 16, 10).cast("long")


def digest60_seeded(seed: int, col: Column) -> Column:
    """Independent hash family member i: digest60('<i>:' || col)."""
    return digest60(F.concat(F.lit(f"{seed}:"), col))


def digest60_py(s: str) -> int:
    """Python twin of digest60 (hashlib md5 == Spark md5 == DuckDB md5):
    for driver-side derivations over literals/small samples that must
    agree bit-for-bit with both engines (e.g. k-means seed order)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:HEX_CHARS], 16)


def sql_digest60(expr: str) -> str:
    """DuckDB twin of ``digest60`` for an arbitrary SQL expression."""
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_CHARS}) AS BIGINT)"


def sql_digest60_seeded(seed: int, expr: str) -> str:
    return sql_digest60(f"'{seed}:' || {expr}")
