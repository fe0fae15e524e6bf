"""Bigram-LM perplexity filter (operators/lm.py): hand-computed
probabilities, smoothing fallbacks on out-of-domain text, model
pruning, and determinism."""

from __future__ import annotations

import math

import pytest

from optimal_parallel_fp_growth_spark.operators.lm import (
    score_perplexity,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [(1, "a b a b"), (2, "a b c")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_probabilities(spark, tiny):
    lm = {
        (r.ctx, r.w): r.logp for r in train_bigram_lm(tiny).collect()
    }
    # bigrams: doc1: ab, ba, ab; doc2: ab, bc → c(a,b)=3, c(b,a)=1,
    # c(b,c)=1; c1(a)=3, c1(b)=2; V = |{a,b,c}| = 3, alpha = 0.5
    assert math.isclose(lm[("a", "b")], math.log((3 + 0.5) / (3 + 1.5)))
    assert math.isclose(lm[("b", "a")], math.log((1 + 0.5) / (2 + 1.5)))
    assert math.isclose(lm[("b", "c")], math.log((1 + 0.5) / (2 + 1.5)))
    # per-context fallback rows ride along with w2 = NULL
    assert math.isclose(lm[("a", None)], math.log(0.5 / (3 + 1.5)))


def test_self_scoring_matches_hand_math(spark, tiny):
    lm = train_bigram_lm(tiny)
    got = {r.doc_id: r for r in score_perplexity(tiny, lm).collect()}
    p_ab = (3 + 0.5) / (3 + 1.5)
    p_ba = (1 + 0.5) / (2 + 1.5)
    p_bc = (1 + 0.5) / (2 + 1.5)
    nll1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    nll2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 2
    assert got[1].avg_nll == round(nll1, 6)
    assert got[2].avg_nll == round(nll2, 6)
    assert got[1].ppl == round(math.exp(nll1), 4)


def test_out_of_domain_fallbacks_are_total(spark, tiny):
    """Unseen bigram with known context → alpha fallback; unknown
    context → uniform 1/V. No nulls, no zero probabilities."""
    lm = train_bigram_lm(tiny)
    oov = spark.createDataFrame(
        [(9, "a c"), (10, "z q")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in score_perplexity(oov, lm).collect()}
    # (a, c) unseen but context a known: p = 0.5/(3+1.5)
    assert got[9].avg_nll == round(-math.log(0.5 / 4.5), 6)
    # (z, q): context unknown → 1/V = 1/3
    assert got[10].avg_nll == round(math.log(3.0), 6)


def test_min_count_prunes_to_fallback(spark, tiny):
    lm2 = train_bigram_lm(tiny, min_count=2)
    pairs = {
        (r.ctx, r.w) for r in lm2.where("w IS NOT NULL").collect()
    }
    assert pairs == {("a", "b")}  # the only bigram with count >= 2
    got = {r.doc_id: r for r in score_perplexity(tiny, lm2).collect()}
    # doc2 'a b c': (a,b) seen (c=3, c1=3), (b,c) pruned → context b
    # pruned entirely → unknown context → 1/V
    p_ab = (3 + 0.5) / (3 + 1.5)
    want = -(math.log(p_ab) + math.log(1 / 3.0)) / 2
    assert got[2].avg_nll == round(want, 6)


def test_validation(spark, tiny):
    from optimal_parallel_fp_growth_spark.operators.lm import train_ngram_lm

    with pytest.raises(ValueError):
        train_bigram_lm(tiny, alpha=0.0)
    with pytest.raises(ValueError):
        train_bigram_lm(tiny, min_count=0)
    with pytest.raises(ValueError):
        train_ngram_lm(tiny, n=5)


def test_trigram_hand_math_and_short_doc_guard(spark):
    from optimal_parallel_fp_growth_spark.operators.lm import train_ngram_lm

    rows = [(1, "a b c a b c"), (2, "a b"), (3, "x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm3 = train_ngram_lm(docs, n=3)
    probs = {(r.ctx, r.w): r.logp for r in lm3.where("w IS NOT NULL").collect()}
    # doc1 trigrams: (a b→c) x2, (b c→a), (c a→b); docs 2 and 3 are
    # SHORTER than the order and must contribute nothing (the
    # sequence-descends guard) — but their tokens still count in V?
    # V counts only tokens inside emitted grams: {a, b, c} = 3
    assert set(probs) == {("a b", "c"), ("b c", "a"), ("c a", "b")}
    V = 3.0
    assert probs[("a b", "c")] == pytest.approx(
        math.log((2 + 0.5) / (2 + 0.5 * V))
    )
    assert probs[("b c", "a")] == pytest.approx(
        math.log((1 + 0.5) / (1 + 0.5 * V))
    )
    got = {r.doc_id: r for r in score_perplexity(docs, lm3).collect()}
    assert got[1].n_bigrams == 4
    assert 2 not in got and 3 not in got  # no trigrams → no score rows


def test_unigram_model_is_smoothed_frequency(spark, tiny):
    from optimal_parallel_fp_growth_spark.operators.lm import train_ngram_lm

    lm1 = train_ngram_lm(tiny, n=1)
    probs = {r.w: r.logp for r in lm1.where("w IS NOT NULL").collect()}
    # tokens: a x3, b x3, c x1 → 7 total; V = 3
    assert probs["a"] == pytest.approx(math.log((3 + 0.5) / (7 + 1.5)))
    assert probs["c"] == pytest.approx(math.log((1 + 0.5) / (7 + 1.5)))


def test_order2_wrapper_equals_general(spark, tiny):
    from optimal_parallel_fp_growth_spark.operators.lm import train_ngram_lm

    a = sorted(map(tuple, train_bigram_lm(tiny).collect()), key=repr)
    b = sorted(map(tuple, train_ngram_lm(tiny, n=2).collect()), key=repr)
    assert a == b


def test_fluent_vs_shuffled_text_separates(spark, sf_small):
    """The filter's reason to exist: natural word order scores lower
    perplexity than the same words shuffled."""
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents").limit(200)
    lm = train_bigram_lm(docs)
    natural = score_perplexity(docs, lm).agg(F.avg("avg_nll")).collect()[0][0]
    shuffled = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.shuffle(F.split(F.col("text"), " "))
        ).alias("text"),
    )
    shuf = score_perplexity(shuffled, lm).agg(F.avg("avg_nll")).collect()[0][0]
    assert natural < shuf
