"""Batch-42 pins: the streaming safety twin is ROW-IDENTICAL to the batch
gate (on top of the shared-oracle driver pin), and the compliance
capstone's first-failing precedence + admission arithmetic hold.
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch42")


def test_stream_safety_equals_batch(spark):
    batch = sorted(
        map(tuple, QUERIES["img_pair_safety_gate"](spark, SF_DIR).collect())
    )
    stream = sorted(
        map(tuple, QUERIES["stream_safety_gate"](spark, SF_DIR).collect())
    )
    assert batch == stream and batch


def test_batch_safety_gate_is_one_map_lane(spark):
    """The carry refactor removed the caption⋈skin join: the batch plan
    must have no join and no shuffle at all."""
    df = QUERIES["img_pair_safety_gate"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan


def test_compliance_precedence_and_admission(spark):
    rows = QUERIES["img_pair_compliance"](spark, SF_DIR).collect()
    assert rows
    reasons = set()
    for r in rows:
        hn = int(r.host[1:])
        opt_out = hn % 3 == 0
        lic_ok = hn % 4 in (0, 2)
        gate_ok = r.compliance_reason is None or not str(
            r.compliance_reason
        ).startswith("gate:")
        if r.compliance_reason is not None and str(
            r.compliance_reason
        ).startswith("gate:"):
            pass  # gate failures take precedence regardless of host policy
        elif opt_out:
            assert r.compliance_reason == "robots_opt_out"
        elif hn % 4 == 3:
            assert r.compliance_reason == "no_license"
        elif hn % 4 == 1:
            assert r.compliance_reason == "license_restricted"
        else:
            assert r.compliance_reason is None
        assert r.admitted == (
            gate_ok and r.compliance_reason is None
        )
        reasons.add(
            "gate" if (r.compliance_reason or "").startswith("gate:")
            else r.compliance_reason
        )
    # every tier of the cascade fires somewhere, and some pairs survive
    assert {"gate", "robots_opt_out", "no_license",
            "license_restricted", None} <= reasons
    assert any(r.admitted for r in rows)


def test_compliance_joins_are_broadcast(spark):
    df = QUERIES["img_pair_compliance"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
