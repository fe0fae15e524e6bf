"""Hashed linear classifier (operators/classifier.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.classifier import (
    WEIGHT_SCALE,
    score_documents,
    seed_weights,
)


def test_seed_weights_deterministic_and_bounded(spark):
    w1 = {r.bucket: r.weight_micro for r in seed_weights(spark, 64).collect()}
    w2 = {r.bucket: r.weight_micro for r in seed_weights(spark, 64).collect()}
    assert w1 == w2 and len(w1) == 64
    assert all(-WEIGHT_SCALE <= v <= WEIGHT_SCALE for v in w1.values())
    # a different seed produces a different table
    w3 = {r.bucket: r.weight_micro for r in seed_weights(spark, 64, "z").collect()}
    assert w1 != w3


def test_score_matches_hand_computation(spark):
    # tiny vocabulary with hand-pinned weights: every token hashes into
    # some bucket of the 8-bucket table we fully control
    docs = spark.createDataFrame(
        [(1, "good good"), (2, "bad"), (3, "good bad")],
        "doc_id long, text string",
    )
    # weight 10^6 (=> +1.0) for every bucket: mean weight is exactly 1
    w = spark.range(8).select(
        F.col("id").alias("bucket"), F.lit(WEIGHT_SCALE).alias("weight_micro")
    )
    out = {r.doc_id: r for r in score_documents(docs, w, n_buckets=8).collect()}
    expect = round(1.0 / (1.0 + math.exp(-1.0)), 6)
    for d in (1, 2, 3):
        assert out[d].score == expect
        assert out[d].label is True
    assert out[1].n_tokens == 2 and out[2].n_tokens == 1


def test_bias_shifts_scores(spark):
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    w = spark.range(8).select(
        F.col("id").alias("bucket"), F.lit(0).alias("weight_micro")
    )
    neutral = score_documents(docs, w, n_buckets=8).collect()[0]
    assert neutral.score == 0.5 and neutral.label is True
    neg = score_documents(docs, w, n_buckets=8, bias=-2.0).collect()[0]
    assert neg.score == round(1.0 / (1.0 + math.exp(2.0)), 6)
    assert neg.label is False


def test_scores_are_probabilities_on_corpus(spark, sf_small):
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    out = score_documents(docs, seed_weights(spark))
    stats = out.agg(
        F.min("score"), F.max("score"), F.count(F.lit(1))
    ).collect()[0]
    assert 0.0 <= stats[0] <= stats[1] <= 1.0
    assert stats[2] == docs.count()


def test_no_python_in_plan(spark, sf_small):
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    plan = (
        score_documents(docs, seed_weights(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # weight table broadcasts
