"""Batch-34 property: the streaming manifest is ROW-IDENTICAL to the
batch capstone — same gates, same placements, over the same pair corpus."""

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch34")


def test_stream_manifest_equals_batch(spark):
    def rowset(name):
        df = QUERIES[name](spark, SF_DIR)
        cols = sorted(df.columns)
        rows = [tuple(r) for r in df.select(cols).collect()]
        return sorted(rows, key=lambda t: t[cols.index("image_id")])

    streamed = rowset("stream_pair_manifest")
    batch = rowset("img_pair_manifest")
    assert streamed == batch and len(streamed) > 0
