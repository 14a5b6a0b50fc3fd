"""Driver-mimic correctness harness: run every __spark_entry__ query on
Spark AND its DuckDB oracle at a given sf, compare row count / column names
/ order-insensitive values. Exit nonzero on any mismatch.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — order-insensitive."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif s.dtype == object:
            pdf[c] = s.astype(str).where(~s.isna(), None)
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(drop=True)


def compare(name: str, spdf: pd.DataFrame, opdf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spdf.columns) != sorted(opdf.columns):
        errs.append(f"schema: spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}")
        return errs
    if len(spdf) != len(opdf):
        errs.append(f"rows: spark={len(spdf)} oracle={len(opdf)}")
    a, b = normalize(spdf), normalize(opdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av):
                eq = (av.fillna(np.nan) == bv.fillna(np.nan)) | (av.isna() & bv.isna())
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
            bad = (~eq).to_numpy().nonzero()[0]
            if len(bad):
                i = int(bad[0])
                errs.append(
                    f"col {c}: {len(bad)} mismatches; first row {i}: "
                    f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r} "
                    f"(row spark={a.iloc[i].to_dict()})"
                )
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from rcspark.session import get_spark

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(spdf)} rows ({t1 - t0:.1f}s)")
            if len(spdf) == 0:
                failed.append(name)
                print(f"FAIL {name}: 0 rows on rows-only query")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        errs = compare(name, spdf, opdf)
        if errs:
            failed.append(name)
            print(f"FAIL {name} ({len(spdf)} vs {len(opdf)} rows):")
            for e in errs:
                print(f"  - {e}")
        else:
            print(
                f"PASS {name}: {len(spdf)} rows (spark {t1 - t0:.1f}s, duck {time.time() - t1:.1f}s)"
            )
    print(f"\n{len(failed)} failed" if failed else "\nall green")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
