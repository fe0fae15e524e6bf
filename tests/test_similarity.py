"""Similarity-search quality properties (parity with the DuckDB oracle
is covered by test_oracle_parity; these check ANN-vs-exact relations)."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.queries_vectors import (
    TOP_K,
    q_knn_ann,
    q_knn_cosine,
)


@pytest.fixture(scope="module")
def exact_and_ann(spark, sf_oracle):
    exact = q_knn_cosine(spark, sf_oracle).collect()
    ann = q_knn_ann(spark, sf_oracle).collect()
    return exact, ann


def test_topk_shape_and_self_exclusion(exact_and_ann):
    exact, ann = exact_and_ann
    for rows in (exact, ann):
        per_q: dict[int, int] = {}
        for r in rows:
            assert r.query_id != r.vec_id
            assert -1.0 <= r.cosine <= 1.0
            per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
        assert all(n <= TOP_K for n in per_q.values())
    # exact tier always fills k (corpus >> k)
    exact_counts = {}
    for r in exact:
        exact_counts[r.query_id] = exact_counts.get(r.query_id, 0) + 1
    assert set(exact_counts.values()) == {TOP_K}


def test_ann_recall_floor(exact_and_ann):
    exact, ann = exact_and_ann
    e = {(r.query_id, r.vec_id) for r in exact}
    a = {(r.query_id, r.vec_id) for r in ann}
    recall = len(e & a) / len(e)
    assert recall >= 0.15, f"ANN recall@{TOP_K} collapsed: {recall:.3f}"


def test_ivf_recall_floor(spark, sf_oracle, exact_and_ann):
    from optimal_parallel_fp_growth_spark.queries_vectors import q_knn_ivf

    exact, _ = exact_and_ann
    e = {(r.query_id, r.vec_id) for r in exact}
    ivf = {(r.query_id, r.vec_id) for r in q_knn_ivf(spark, sf_oracle).collect()}
    recall = len(e & ivf) / len(e)
    assert recall >= 0.15, f"IVF recall@{TOP_K} collapsed: {recall:.3f}"


def test_arrow_scorer_matches_expression_scorer(spark, sf_oracle):
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_arrow,
    )
    from optimal_parallel_fp_growth_spark.queries_vectors import (
        QUERY_STRIDE,
        _emb_and_queries,
    )

    emb, queries = _emb_and_queries(spark, sf_oracle)
    a = {tuple(r) for r in cosine_topk(emb, queries, k=10).collect()}
    b = {tuple(r) for r in cosine_topk_arrow(emb, queries, k=10).collect()}
    assert a == b


def test_ann_cosines_agree_with_exact(exact_and_ann):
    """For pairs surfaced by both tiers, the scored cosine is identical
    (ANN approximates the candidate set, never the metric)."""
    exact, ann = exact_and_ann
    e = {(r.query_id, r.vec_id): r.cosine for r in exact}
    for r in ann:
        key = (r.query_id, r.vec_id)
        if key in e:
            assert e[key] == r.cosine


def test_two_phase_topk_exact_across_partitionings(spark, sf_oracle):
    """Partition-local + global top-k must equal the single-window
    result regardless of how the corpus is partitioned (exactness of
    the two-phase decomposition, incl. rounded-cosine ties)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.operators.similarity import cosine_topk
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    baseline = None
    for n_parts in (1, 7):
        got = sorted(
            tuple(r)
            for r in cosine_topk(emb.repartition(n_parts), queries, k=8).collect()
        )
        if baseline is None:
            baseline = got
        assert got == baseline
    # reference single-window rank over the same scored space
    ref = sorted(
        tuple(r)
        for r in cosine_topk(emb, queries, k=8)
        .select("query_id", "vec_id", "cosine", "rn")
        .collect()
    )
    assert ref == baseline
