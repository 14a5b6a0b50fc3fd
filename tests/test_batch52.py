"""Semantic properties of the round-5 batch-52 operators:

- warehouse refs: tags are immutable (re-tag raises), branches only move
  forward (backward raises; a tag can't be branch-moved), fast_forward
  publishes to the target head, read_ref serves the ref's wave.
- img_phash_dihedral: every planted rotation/flip lands in its
  original's group (the D4 invariance law end-to-end through the
  engine), the canonical member is the o: item, and unplanted originals
  form their own (usually singleton) groups.
"""

from __future__ import annotations

import tempfile

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch52")


def test_ref_laws(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from rcspark.tables import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="rcspark_refs_"))
    schema = T.StructType([T.StructField("k", T.LongType(), False)])
    for w in (0, 1):
        wh.write_wave("t", spark.range(10 * (w + 1)).select(
            F.col("id").alias("k")), w)
        wh.commit(w, {})
    wh.set_tag("v1", 0)
    with pytest.raises(ValueError):
        wh.set_tag("v1", 1)  # tags immutable
    wh.set_branch("main", 0)
    wh.set_branch("main", 1)  # forward ok
    with pytest.raises(ValueError):
        wh.set_branch("main", 0)  # backward refused
    with pytest.raises(ValueError):
        wh.set_branch("v1", 1)  # a tag is not a branch
    assert wh.ref_head("main") == ("branch", 1)
    assert wh.ref_head("v1") == ("tag", 0)
    wh.set_branch("audit", 1)
    assert wh.fast_forward("main", "audit") == 1
    assert wh.read_ref("t", "v1", schema).count() == 10
    assert wh.read_ref("t", "main", schema).count() == 30
    with pytest.raises(KeyError):
        wh.ref_head("nope")


def test_wap_stages(spark):
    rows = {(r.stage, r.ref): r
            for r in QUERIES["warehouse_wap_publish"](spark, SF_DIR).collect()}
    assert set(rows) == {("pre", "main"), ("pre", "audit"), ("pre", "v1"),
                         ("post", "main")}
    # publish moves main exactly to the audited head
    assert rows[("post", "main")].n_rows == rows[("pre", "audit")].n_rows
    assert rows[("post", "main")].sum_cents == rows[("pre", "audit")].sum_cents
    # and the tag stayed frozen below the pre-publish main
    assert rows[("pre", "v1")].n_rows < rows[("pre", "main")].n_rows


def test_dihedral_groups(spark):
    rows = QUERIES["img_phash_dihedral"](spark, SF_DIR).collect()
    assert rows
    by_item = {r.item_id: r for r in rows}
    planted = [r for r in rows if r.item_id.startswith("r:")]
    assert planted
    for r in planted:
        o = by_item["o:" + r.item_id[2:]]
        assert r.dihedral_key == o.dihedral_key, (r, o)  # invariance law
        assert r.group_size >= 2 and o.group_size == r.group_size
        assert not r.is_canonical  # 'o:' < 'r:' lexicographically
    # canonical election: exactly one canonical per key
    keys = {}
    for r in rows:
        keys.setdefault(r.dihedral_key, []).append(r)
    for key, members in keys.items():
        assert sum(1 for m in members if m.is_canonical) == 1
        assert len(members) == members[0].group_size
