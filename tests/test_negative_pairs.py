"""Deterministic negative-pair mining (operators/sampling.py::
negative_pairs): determinism, self-exclusion, coverage, and the
near-dup exclusion fallback."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.sampling import negative_pairs
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return load_table(spark, sf_small, "documents").select("doc_id", "text")


def test_deterministic_and_self_free(docs):
    a = {tuple(r) for r in negative_pairs(docs, k=3).collect()}
    b = {tuple(r) for r in negative_pairs(docs, k=3).collect()}
    assert a == b and len(a) > 0
    assert all(d != n for d, _, n in a)
    # different salt → different pairing
    c = {tuple(r) for r in negative_pairs(docs, k=3, salt="neg2").collect()}
    assert a != c


def test_coverage_close_to_k(docs):
    n = docs.count()
    out = negative_pairs(docs, k=4)
    got = out.count()
    # empty-bucket losses only (P ≈ e^-8 per probe)
    assert got >= 0.9 * 4 * n
    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 4


def test_exclusion_falls_back_not_drops(spark):
    """When the tiebreak winner is an excluded near-dup, the probe must
    pick the next bucket member, not vanish."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # force ONE bucket so every doc sees every other as candidate
    base = negative_pairs(docs, k=2, n_buckets=1)
    winners = {(r.doc_id, r.pair_idx): r.neg_id for r in base.collect()}
    assert len(winners) == 80
    # exclude every doc's current winner for pair_idx 0
    excl = spark.createDataFrame(
        [(d, n) for (d, j), n in winners.items() if j == 0],
        "doc_a long, doc_b long",
    )
    out = negative_pairs(docs, k=2, n_buckets=1, exclude=excl)
    replaced = {(r.doc_id, r.pair_idx): r.neg_id for r in out.collect()}
    assert len(replaced) == 80  # nothing dropped
    for (d, j), n in replaced.items():
        if j == 0:
            assert n != winners[(d, j)]  # fallback engaged
            assert n != d


def test_hard_negatives_band_and_exactness(spark, sf_small):
    """Every returned cosine is exact, inside the band, ranked, and
    below the near-dup zone (cross-checked against exact top-k)."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        cosine_topk,
        hard_negatives,
    )

    emb = load_table(spark, sf_small, "embeddings")
    q = emb.where(F.col("vec_id") % 50 == 0)
    out = hard_negatives(emb, q, lo=0.2, hi=0.45, k=5, bits=6, seed=2)
    rows = out.collect()
    assert rows
    exact = {
        (r.query_id, r.vec_id): r.cosine
        for r in cosine_topk(emb, q, k=10**6).collect()
    }
    for r in rows:
        assert 0.2 <= r.cosine <= 0.45
        assert exact[(r.query_id, r.vec_id)] == r.cosine
        assert 1 <= r.rn <= 5
