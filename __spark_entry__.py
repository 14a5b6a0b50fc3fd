"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in rcspark.queries — every operator there is
specified once as a Spark callable and once as DuckDB SQL, generated from
shared snippet builders so the two renderings cannot drift (see
rcspark/datapipe/hashing.py for the cross-engine determinism tricks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rcspark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one politeness-scheduler wave (salted two-phase top-k with
    per-host crawl-delay budgets — SURVEY.md A5/A6) over a frontier derived
    from /root/testdata/sf0.001."""
    return QUERIES["crawl_schedule"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — every registered query has one (round 2): the media
    codec paths compare against independent-twin expected-values parquet
    (tests/data/media_expected, scripts/gen_media_expected.py)."""
    return dict(ORACLE)
