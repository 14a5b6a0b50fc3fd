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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcspark.oracle_compare import compare  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


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
            # release per-query persists (lsh/jaccard/neardup/bloom paths
            # persist fan-out points); 50 queries in one JVM otherwise
            # accumulate cached partitions (ADVICE r1)
            spark.catalog.clearCache()
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
        errs = compare(spdf, opdf)
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
