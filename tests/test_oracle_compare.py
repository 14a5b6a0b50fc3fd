"""The selfcheck comparator must be driver-strict: the driver hashes rendered
values, so an int64 Spark column vs a float64 oracle column (DuckDB
sum(BIGINT) -> HUGEINT -> float64) fails there even when numerically equal.
compare() must flag that divergence instead of coercing it away
(VERDICT r1 "What's wrong" #3)."""

from __future__ import annotations

import duckdb
import pandas as pd

from rcspark.oracle_compare import compare


def test_int_vs_float_dtype_divergence_flagged():
    spark_side = pd.DataFrame({"k": ["a", "b"], "v": pd.array([150, 7], dtype="int64")})
    oracle_side = pd.DataFrame({"k": ["a", "b"], "v": [150.0, 7.0]})
    errs = compare(spark_side, oracle_side)
    assert errs and "dtype class" in errs[0]


def test_deliberate_hugeint_oracle_fails():
    # A bare sum(BIGINT) in DuckDB yields HUGEINT which pandas renders as
    # float64 — exactly the bug class that hit skew_salted_agg round 1.
    con = duckdb.connect()
    opdf = con.execute(
        "SELECT sum(v) AS s FROM (VALUES (CAST(100 AS BIGINT)), (50)) t(v)"
    ).fetchdf()
    spdf = pd.DataFrame({"s": pd.array([150], dtype="int64")})
    assert compare(spdf, opdf), "HUGEINT oracle must be flagged, not coerced"
    # And the CAST(... AS BIGINT) fix makes it green:
    opdf_cast = con.execute(
        "SELECT CAST(sum(v) AS BIGINT) AS s FROM (VALUES (CAST(100 AS BIGINT)), (50)) t(v)"
    ).fetchdf()
    assert compare(spdf, opdf_cast) == []


def test_equal_frames_still_green():
    a = pd.DataFrame({"x": [1, 2], "y": [0.5, None]})
    b = pd.DataFrame({"x": pd.array([2, 1], dtype="Int64"), "y": [None, 0.5]})
    assert compare(a, b) == []
