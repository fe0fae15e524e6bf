"""Data-quality constraint suite: verdict semantics on dirty data, and
the single-pass plan guarantee (all constraints in one aggregation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.quality_checks import (
    Check,
    check_suite,
    completeness,
    consistency,
    documents_quality_suite,
    max_of,
    membership,
    uniqueness,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "hello world", "en", "src0", 11),
        (2, None, "en", "src0", 0),        # null text
        (2, "dup id", "xx", "src1", 6),    # dup key + bad lang
        (3, "ok", "de", None, 99),         # null source + wrong n_chars
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _verdicts(df):
    return {r["check"]: (r["observed"], r["passed"]) for r in df.collect()}


def test_dirty_data_verdicts(dirty):
    out = check_suite(
        dirty,
        [
            Check("text_complete", completeness("text"), 1.0, "=="),
            Check("doc_id_unique", uniqueness("doc_id"), 1.0, "=="),
            Check("lang_accepted", membership("lang", ["en", "de"]), 1.0, "=="),
            Check(
                "n_chars_consistent",
                consistency(F.col("n_chars") == F.length("text")),
                0.99,
            ),
            Check("max_chars", max_of("n_chars"), 50.0, "<="),
        ],
    )
    v = _verdicts(out)
    assert v["text_complete"] == (0.75, False)
    assert v["doc_id_unique"] == (0.75, False)
    assert v["lang_accepted"] == (0.75, False)
    # consistency: avg over non-null comparisons; row2 NULL comparison -> NULL
    # is skipped by avg, rows 1,3 true, row 4 false -> 2/3
    assert v["n_chars_consistent"][1] is False
    assert v["max_chars"] == (99.0, False)


def test_clean_corpus_all_pass(spark, sf_small):
    out = documents_quality_suite(load_table(spark, sf_small, "documents"))
    v = _verdicts(out)
    assert len(v) == 6
    assert all(passed for _, passed in v.values()), v


def test_single_pass_plan(spark, sf_small):
    """All constraints must compile into ONE aggregation over ONE scan:
    exactly one parquet scan and no more than the partial/final (+
    distinct expand) HashAggregate chain — no per-constraint jobs."""
    out = documents_quality_suite(load_table(spark, sf_small, "documents"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_validation_errors(dirty):
    with pytest.raises(ValueError, match="at least one"):
        check_suite(dirty, [])
    c = Check("x", completeness("text"), 1.0)
    with pytest.raises(ValueError, match="duplicate"):
        check_suite(dirty, [c, c])
    with pytest.raises(ValueError, match="unsupported op"):
        check_suite(dirty, [Check("y", completeness("text"), 1.0, "!=")]).collect()
