"""Prefix-filter exact jaccard join (operators/dedup.py::
ngram_jaccard_prefix): equality with the all-postings exact tier
(crafted + fixture corpora + hypothesis), boundary-τ inclusion, and
the prefix-volume reduction that fixes the exact tier's scale hazard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_prefix,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_matches_exact_tier_on_fixture_corpus(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    for tau in (0.2, 0.5):
        exact = _pairs(ngram_jaccard_pairs(docs, threshold=tau, max_df=0))
        pref = _pairs(ngram_jaccard_prefix(docs, threshold=tau))
        assert pref == exact
        assert len(exact) > 0 or tau > 0.2  # fixture has low-sim pairs


def test_boundary_jaccard_exactly_tau_included(spark):
    # J(a,b) = 2/10 = 0.2 exactly at tau = 0.2 (the double-rounding
    # hazard the eps guard exists for): 2-gram shingles over crafted
    # token streams with a known intersection
    a = "c1 c2 x1 x2 x3 x4 x5 x6"        # 7 shingles
    b = "c1 c2 y1 y2 y3 y4 y5 y6"        # 7 shingles, shares 1 ("c1 c2")
    # shared shingles: "c1 c2" only → inter=1, union=13 → 1/13 ≈ 0.0769
    # craft instead overlapping run: shared prefix "c1 c2 c3" gives 2
    # shared 2-grams; sizes 7 → J = 2/12 = 1/6; use tau = 1/6
    a2 = "c1 c2 c3 x1 x2 x3 x4 x5"
    b2 = "c1 c2 c3 y1 y2 y3 y4 y5"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, a2), (4, b2)], "doc_id long, text string"
    )
    tau = 1 / 6  # not exactly representable in binary
    pref = _pairs(ngram_jaccard_prefix(docs, threshold=tau))
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=tau, max_df=0))
    assert pref == exact
    assert (3, 4, round(2 / 12, 6)) in pref


def test_hot_token_corpus_prefix_volume_shrinks(spark):
    """A stop-shingle shared by EVERY doc: the all-postings tier makes
    all n² pairs candidates; the prefix tier must not (the hot shingle
    sorts last and leaves every prefix), while results stay equal."""
    n = 60
    docs = spark.createDataFrame(
        [(i, f"the of u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(n)],
        "doc_id long, text string",
    )
    tau = 0.5
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=tau, max_df=0))
    pref_df = ngram_jaccard_prefix(docs, threshold=tau)
    assert _pairs(pref_df) == exact == set()  # no pair reaches 0.5
    # candidate volume: rebuild the prefix frame and count join rows
    from optimal_parallel_fp_growth_spark.operators.dedup import (
        _doc_shingles,
    )
    from pyspark.sql import Window

    sh = _doc_shingles(docs, "text", 2).where(F.size("sh") > 0)
    posting = sh.select("doc_id", F.explode("sh").alias("shingle"))
    dfreq = posting.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    pref = (
        posting.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .where(F.col("rn") <= F.col("n_sh") - F.ceil(F.lit(tau) * F.col("n_sh") - 1e-9) + 1)
    )
    cand_rows = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    # all-postings candidates include the n*(n-1)/2 hot-shingle pairs
    # (two hot shingles: "the of" and "of u{i}a" is unique... "the of"
    # is shared by all 60 docs → 1770 pairs at minimum)
    assert cand_rows < n * (n - 1) / 2 / 4  # prefix kills the head


def test_property_prefix_equals_exact(spark):
    from hypothesis import given, settings, strategies as st

    vocab = [f"w{i}" for i in range(12)]
    doc_strat = st.lists(
        st.sampled_from(vocab), min_size=2, max_size=10
    ).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(texts=st.lists(doc_strat, min_size=2, max_size=8),
           tau=st.sampled_from([0.2, 1 / 3, 0.5, 0.7]))
    def run(texts, tau):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        assert _pairs(ngram_jaccard_prefix(docs, threshold=tau)) == _pairs(
            ngram_jaccard_pairs(docs, threshold=tau, max_df=0)
        )

    run()


def test_candidate_join_has_no_trivially_true_predicate(spark):
    """VERDICT r14 task #6: the prefix candidate self-join previously
    joined `a.h == b.h` where both sides shared the attribute lineage,
    which Spark resolves to the trivially-true `h == h` (WARN in the
    bench tail) — the exact shape accidental cartesians start from.
    Assert the analyzed plan's join conditions never compare an
    attribute to ITSELF (same name AND same expression id)."""
    import re

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id long, text string",
    )
    plan = ngram_jaccard_prefix(docs, threshold=0.5)._jdf.queryExecution(
    ).analyzed().toString()
    trivial = [
        m.group(0)
        for m in re.finditer(r"\(([a-zA-Z_]+#\d+L?) = \1\)", plan)
    ]
    assert not trivial, f"trivially-true predicates in plan: {trivial}"
