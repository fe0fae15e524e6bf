"""Gopher-style quality gate (operators/textops.py::gopher_rules):
per-rule boundary behavior on crafted docs + zero-shuffle plan."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.operators.textops import gopher_rules


@pytest.fixture(scope="module")
def crafted(spark):
    good = "the quick brown fox jumps over the lazy dog and it is glad " * 3
    rows = [
        (1, good.strip()),                      # passes everything
        (2, "the and of it is"),                # too short (5 words)
        (3, ("ab " * 30).strip()),              # mean word len 2 < 3; loopy
        (4, ("the " * 40).strip()),             # dup ratio 1/40 < 0.3
        (5, ("12345 6789 " * 15).strip()),      # no alpha, no stopwords
        (6, " ".join(f"verylongword{i}extremelylong" for i in range(30))),
        #    ^ mean word len > 10, no stopwords
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rule_verdicts(crafted):
    out = {r.doc_id: r for r in gopher_rules(crafted).collect()}
    assert out[1].keep
    assert all(
        getattr(out[1], f)
        for f in ("pass_word_count", "pass_word_len", "pass_alpha",
                  "pass_stopwords", "pass_dup")
    )
    assert not out[2].pass_word_count and not out[2].keep
    assert not out[3].pass_word_len and not out[3].keep
    assert out[4].pass_word_count and not out[4].pass_dup and not out[4].keep
    assert not out[5].pass_alpha and not out[5].pass_stopwords
    assert not out[6].pass_word_len and not out[6].keep


def test_thresholds_configurable(crafted):
    out = {
        r.doc_id: r
        for r in gopher_rules(
            crafted, min_words=3, min_word_len=0.0, max_word_len=99.0,
            min_alpha_ratio=0.0, min_stopword_hits=0, min_distinct_ratio=0.0,
        ).collect()
    }
    assert all(r.keep for r in out.values())


def test_single_stage_no_shuffle(crafted):
    plan = gopher_rules(crafted)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
