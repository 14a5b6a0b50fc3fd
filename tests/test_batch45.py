"""Batch-45 pins: hand-built ustar headers vs the stdlib tarfile reader,
and the tar-shard roundtrip proving img_shard_layout's offsets against
real container bytes.
"""

from __future__ import annotations

import io
import tarfile

import pytest

from rcspark.queries import QUERIES
from rcspark.tarshard import build_tar, ustar_header, verify_tar

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch45")


def test_ustar_member_content_roundtrip():
    members = [("a.bin", b"hello" * 100), ("b.bin", b""), ("c.bin", b"x")]
    data = build_tar(members)
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        for (name, payload), m in zip(members, tf.getmembers()):
            assert m.name == name and m.size == len(payload)
            if payload:
                assert tf.extractfile(m).read() == payload
    # deterministic: same members -> identical bytes
    assert build_tar(members) == data
    # every header is 512-aligned; archive ends with two zero blocks
    assert len(data) % 512 == 0
    assert data[-1024:] == b"\x00" * 1024


def test_ustar_name_limit_raises():
    with pytest.raises(ValueError):
        ustar_header("x" * 100, 1)


def test_verify_tar_catches_wrong_offsets():
    members = [("a.bin", b"p" * 10)]
    data = build_tar(members)
    assert verify_tar(data, [("a.bin", 10, 512)])
    assert not verify_tar(data, [("a.bin", 10, 1024)])
    assert not verify_tar(data, [("a.bin", 11, 512)])


def test_tar_roundtrip_query_all_verified(spark):
    rows = QUERIES["img_shard_tar_roundtrip"](spark, SF_DIR).collect()
    assert rows
    assert all(r.len_match and r.offsets_verified for r in rows)
    assert sum(r.n_samples for r in rows) == 200  # every part row sharded
    assert all(r.tar_len % 512 == 0 for r in rows)
