"""Semantic properties of the round-5 batch-46 operators — the published
text-quality rule bundles:

- doc_gopher_rules: each planted pathology class trips exactly its target
  rule (first-failing order pinned), the clean class keeps, and every
  ratio rule is integer-exact (no float crosses the verdict).
- doc_c4_filters: line-drop attribution is a partition of the dropped
  lines, page-drop precedence (lorem > brace > sentences) holds, and
  cleaned_text reassembly preserves input line order.
- crawl_url_softscore: strict words block alone, two soft words co-occur
  to block, fragments never block alone, and the documented substring
  false positive ('winter' hits 'win') scores but does not block.
"""

from __future__ import annotations

import pytest

from rcspark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from rcspark.session import get_spark

    return get_spark("test_batch46")


# ---------------------------------------------------------------- gopher

_GOPHER_CLASS_FAIL = {
    0: None,            # clean
    1: "word_count",
    2: "mean_word_len",
    3: "symbol_ratio",
    4: "bullet_lines",
    5: "ellipsis_lines",
    6: "alpha_ratio",
    7: "stopwords",
}


def test_gopher_class_to_first_fail(spark):
    rows = QUERIES["doc_gopher_rules"](spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        expect = _GOPHER_CLASS_FAIL[r.doc_id % 8]
        assert r.first_fail == expect, (r.doc_id, r.first_fail, expect)
        assert r.keep == (expect is None)


def test_gopher_counters_consistent(spark):
    rows = QUERIES["doc_gopher_rules"](spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r.alpha_words <= r.n_words
        assert r.bullet_lines <= r.n_lines
        assert r.ellipsis_lines <= r.n_lines
        assert 0 <= r.stopword_hits <= 8
        if r.keep:
            # every individual rule must hold on the clean class
            assert 40 <= r.n_words <= 100000
            assert 3 * r.n_words <= r.word_chars <= 10 * r.n_words
            assert 10 * r.symbol_hits <= r.n_words
            assert 10 * r.bullet_lines <= 9 * r.n_lines
            assert 10 * r.ellipsis_lines <= 3 * r.n_lines
            assert 5 * r.alpha_words >= 4 * r.n_words
            assert r.stopword_hits >= 2


# -------------------------------------------------------------------- c4

def test_c4_line_attribution_partitions_drops(spark):
    rows = QUERIES["doc_c4_filters"](spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_lines == 6
        assert r.n_kept + r.drop_punct + r.drop_short + r.drop_js == r.n_lines
        # the fixed planted lines: 'ok fine.' is always short-dropped,
        # the javascript line is always js-dropped
        assert r.drop_short >= 1
        assert r.drop_js == 1


def test_c4_page_precedence_and_reassembly(spark):
    rows = QUERIES["doc_c4_filters"](spark, SF_DIR).collect()
    for r in rows:
        k = r.doc_id
        if k % 17 == 0:
            assert r.page_reason == "lorem_ipsum"
        elif k % 13 == 0:
            assert r.page_reason == "brace"
        elif k % 11 == 0:
            assert r.page_reason == "too_few_sentences"
        else:
            assert r.page_reason is None and r.keep
        if r.keep:
            lines = r.cleaned_text.split("\n")
            assert len(lines) == r.n_kept
            # order preserved: the good first line precedes the good
            # closing sentence
            assert lines[0].endswith(" and more here.")
            assert lines[-1] == "another good closing sentence."
        else:
            assert r.cleaned_text is None


# -------------------------------------------------------------- softscore

def test_softscore_class_verdicts(spark):
    rows = QUERIES["crawl_url_softscore"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        c = r.p_partkey % 9
        if c == 0:   # strict alone blocks
            assert r.strict_hits == 1 and r.blocked
        elif c == 1:  # two soft words co-occur -> block
            assert r.soft_hits == 2 and r.score_milli == 1000 and r.blocked
        elif c == 2:  # one soft word passes
            assert r.soft_hits == 1 and not r.blocked
        elif c == 3:  # hot + sexy
            assert r.soft_hits == 2 and r.blocked
        elif c == 4:  # fragments never block alone
            assert r.frag_hits == 2 and r.score_milli == 500 and not r.blocked
        elif c == 6:
            assert r.strict_hits == 1 and r.blocked
        elif c == 7:  # substring FP: 'winter' contains 'win' -> scores, no block
            assert r.soft_hits == 1 and r.score_milli == 500 and not r.blocked
        elif c == 8:
            assert r.strict_hits == 1 and r.blocked
        assert r.score_milli == (1000 * r.strict_hits + 500 * r.soft_hits
                                 + 250 * r.frag_hits)
        assert r.blocked == (r.score_milli >= 1000)
