"""Plan assertions for the exact-percentile/rank family (VERDICT r3 item 1).

These six queries used to compile to an ``Exchange SinglePartition`` + full
``Sort`` feeding a Window — the whole table through one task, correct at
sf0.1 and dead at the 10^10-row frontier. After the rcspark.percentile /
assign_global_seq rewrite the executed plan must show:

- NO Window operator at all (the rank is a range-partitioned cumsum);
- every remaining ``Exchange SinglePartition`` is the benign final step of
  a global aggregate (fed directly by a partial HashAggregate — only one
  pre-combined row per map task crosses it), never a Sort of data rows;
- at least one ``Exchange rangepartitioning`` — the distributed total-order
  shape that replaced the single-task sort.

Values are pinned by the selfcheck oracles; this test pins the SHAPE, like
tests/test_bucketed_join.py pins the zero-shuffle co-located join.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("RCSPARK_TEST_SF", "/root/testdata/sf0.001")

FAMILY = (
    "agg_percentile_disc",
    "agg_percentile_cont",
    "events_outlier_iqr",
    "doc_dataset_card",
    "crawl_host_fairness",
    "crawl_fetch_balance",
)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", FAMILY)
def test_no_single_partition_sort(spark, name):
    from rcspark.queries import QUERIES

    plan = _executed_plan(QUERIES[name](spark, SF_DIR))
    assert "Window" not in plan, f"{name}: window survived the rewrite\n{plan}"
    assert "Exchange rangepartitioning" in plan, (
        f"{name}: expected the range-partitioned rank shape\n{plan}"
    )
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "HashAggregate" in child and "partial_" in child, (
            f"{name}: Exchange SinglePartition not fed by a partial "
            f"aggregate:\n{line}\n{child}"
        )
        assert "Sort" not in child, f"{name}: sort under SinglePartition"
    spark.catalog.clearCache()
