"""Pytest gate over the driver contract: every oracle-checked query in
__spark_entry__ must value-match its DuckDB twin at sf0.001 (fast tier;
scripts/selfcheck.py runs the same comparison at sf0.01, the driver's
scale). Rows-only queries must return rows."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from rcspark.oracle_compare import compare

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


QS = entrymod.queries()
ORACLES = entrymod.oracle_sql()


# VERDICT r2 #5: prose ("N queries" in CLAUDE.md / BENCH/*.md) must not
# drift from the registry. Bump this constant — and the prose — together.
EXPECTED_QUERY_COUNT = 324


def test_registry_shape():
    assert set(ORACLES) <= set(QS)
    assert len(QS) == EXPECTED_QUERY_COUNT, (
        f"registry holds {len(QS)} queries, expected {EXPECTED_QUERY_COUNT} — "
        "update EXPECTED_QUERY_COUNT and the counts in CLAUDE.md/BENCH docs"
    )
    assert len(ORACLES) == len(QS), "every query needs a DuckDB oracle twin"


@pytest.mark.parametrize("name", sorted(QS))
def test_query_matches_oracle(name, spark, duck):
    spdf = QS[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(spdf) > 0, f"rows-only query {name} returned nothing"
        return
    opdf = duck.execute(ORACLES[name]).fetchdf()
    errs = compare(spdf, opdf)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {f.name for f in df.schema.fields} == {
        "host", "url_canon", "priority", "j", "fetch_ms", "budget",
    }
