"""Batch-35 property: nested sitemap-index recursion is LOSSLESS — every
order URL surfaces exactly once, inside the child sitemap its key maps to."""

import re

import pytest

from rcspark.queries import _SMI_CHILDREN, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch35")


def test_sitemap_index_lossless_recursion(spark):
    rows = QUERIES["crawl_sitemap_index"](spark, SF_DIR).collect()
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert len(rows) == n_orders
    seen = set()
    for r in rows:
        k = int(re.search(r"/o/(\d+)$", r.loc).group(1))
        assert k not in seen
        seen.add(k)
        c = int(re.search(r"sitemap-(\d+)\.xml$", r.child_loc).group(1))
        assert c == k % _SMI_CHILDREN, "URL landed in the wrong child"
        assert 1 <= r.child_seq <= _SMI_CHILDREN
        assert r.child_loc.startswith(f"http://{r.host}.example/")
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", r.lastmod)
