"""Registry-wide physical-plan sweep: flag scale-killer shapes.

For every QUERIES entry, build the DataFrame (no execution for batch
queries — plans come from queryExecution().executedPlan() which is
analysis/planning only) and scan the plan string for:

- Sort directly under Exchange SinglePartition  -> global single-task sort
  (the class the round-4 percentile rewrite eliminated);
- Window over a SinglePartition exchange        -> same killer, window form;
- Exchange SinglePartition NOT fed by a partial aggregate -> anything
  funnelling data-scale rows through one task for a non-scalar reason.

Streaming queries (readStream sources) and the handful of engine-loop
queries that EXECUTE work at build time are skipped by name prefix —
their shapes are pinned by their own tests.

Usage: python scripts/plan_sweep.py [sf_dir]
Writes a per-query verdict line; exits nonzero if any query is flagged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose CALLABLE runs jobs/streams at build time (loop engines,
# streaming sinks, training iterations) — their scale shapes are pinned by
# dedicated pytest plan/equality tests instead.
SKIP_PREFIXES = ("stream_",)
SKIP_EXACT = {
    "crawl_fetch_parity",  # spins a live HTTP server
    "warehouse_compact_read", "warehouse_time_travel",
    "warehouse_incr_agg", "warehouse_snapshot_diff",
    "warehouse_partition_evolution", "warehouse_schema_evolution",
    "warehouse_hidden_partitioning", "warehouse_zonemap_skip",
    "warehouse_zorder", "table_merge_upsert",  # write-then-read paths
}


def sweep(sf_dir: str) -> int:
    from rcspark.queries import QUERIES
    from rcspark.session import get_spark

    spark = get_spark("plan_sweep")
    flagged: list[tuple[str, str]] = []
    n_checked = 0
    for name, fn in sorted(QUERIES.items()):
        if name.startswith(SKIP_PREFIXES) or name in SKIP_EXACT:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, don't die
            flagged.append((name, f"plan build failed: {e}"))
            continue
        n_checked += 1
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            child = lines[i + 1] if i + 1 < len(lines) else ""
            if "Sort" in child:
                flagged.append((name, "Sort under Exchange SinglePartition"))
            elif "Window" in child:
                flagged.append((name, "Window over Exchange SinglePartition"))
            elif "HashAggregate" in child and "partial_" in child:
                pass  # scalar/global final agg fed by map-side partials — OK
            elif "ObjectHashAggregate" in child and "partial_" in child:
                pass
            elif "AQEShuffleRead" in child or "ShuffleQueryStage" in child:
                pass  # AQE wrapper; the real child was a partial agg
            else:
                flagged.append(
                    (name, f"SinglePartition over non-partial: {child.strip()[:80]}")
                )
        spark.catalog.clearCache()
    print(f"checked {n_checked} query plans")
    for name, why in flagged:
        print(f"FLAG {name}: {why}")
    if not flagged:
        print("no scale-killer shapes found")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(sweep(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
