"""Semantic properties of the round-4 batch-33 operator: the planted
logo/header/footer cluster structure, verdict thresholds, alignment
semantics, and the overwrite precedence of the block fixture."""

import pytest

from rcspark.queries import _TEMPLATE_MIN_SHARED, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch33")


def test_shared_patch_pairs_structure(spark):
    rows = QUERIES["img_shared_patch_pairs"](spark, SF_DIR).collect()
    assert rows
    pairs = {(r.img_a, r.img_b): r for r in rows}
    # sf0.001 image indices i = 0..19. Logo carriers: i%5==0 minus i=0
    # (its position (0,0) is overwritten by the HDR plant) -> {5,10,15}.
    # HDR+FTR carriers: i%7==0 -> {0,7,14}.
    logo = {5, 10, 15}
    hf = {0, 7, 14}

    def key(i, j):
        a, b = f"img{i * 10}", f"img{j * 10}"
        return (a, b) if a < b else (b, a)

    expected = {}
    for s, n in ((logo, 1), (hf, 2)):
        for i in s:
            for j in s:
                if i < j:
                    expected[key(i, j)] = expected.get(key(i, j), 0) + n
    assert {k: r.n_shared for k, r in pairs.items()} == expected
    for r in rows:
        assert r.is_template == (r.n_shared >= _TEMPLATE_MIN_SHARED)
        if r.n_shared == 2:  # HDR/FTR sit at fixed (0,0)/(7,7) -> aligned
            assert r.n_aligned == 2
        if r.n_shared == 1:  # logo position varies with i -> never aligned
            assert r.n_aligned in (0, 1)
    assert any(r.is_template for r in rows)
    assert any(not r.is_template for r in rows)


def test_patch_fixture_overwrite_precedence():
    from rcspark.datapipe.multimodal import patch_block_seeds

    s0 = patch_block_seeds(0)  # i=0: logo lands on (0,0), HDR overwrites
    assert s0[(0, 0)] == 777000002 and s0[(7, 7)] == 777000003
    assert 777000001 not in s0.values()
    s50 = patch_block_seeds(50)  # i=5: logo at ((185)%8, (265)%8) = (1, 1)
    assert s50[(1, 1)] == 777000001
