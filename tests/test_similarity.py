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


def test_ann_bits_for_scaling_and_clamps():
    from optimal_parallel_fp_growth_spark.operators.similarity import ann_bits_for

    # occupancy-bounded growth: bucket count tracks corpus size
    assert ann_bits_for(500, 64) == 4          # 500 <= 64*2^4
    assert ann_bits_for(2000, 64) == 5         # needs 32 buckets
    assert ann_bits_for(64 * (1 << 10) + 1, 64) == 11
    assert ann_bits_for(10**12, 64) == 16      # max_bits clamp
    assert ann_bits_for(10**12, 8) == 8        # dim clamp
    assert ann_bits_for(1, 64) == 4            # min_bits clamp
    # monotone in corpus size
    prev = 0
    for n in (10, 10**3, 10**5, 10**7, 10**9):
        b = ann_bits_for(n, 64)
        assert b >= prev
        prev = b


def test_ann_recall_at_two_widths(spark, sf_oracle, exact_and_ann):
    """Recall-vs-exact at two bucket widths (the auto width for this
    corpus, 4, and the pinned default 6): floors hold, recall is
    monotone in candidate volume, and widening really shrinks the
    bucket-collision volume. (At aggressively wide settings, e.g. 10
    bits over 500 docs, recall measurably collapses - that is the
    over-widening ann_bits_for's occupancy target exists to prevent.)"""
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.operators.similarity import (
        _prepared,
        _sign_bucket,
        ann_topk,
    )
    from optimal_parallel_fp_growth_spark.queries_vectors import TOP_K
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    exact, _ = exact_and_ann
    e = {(r.query_id, r.vec_id) for r in exact}
    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.orderBy("vec_id").limit(20)

    def bucket_sizes(bits):
        return (
            _prepared(emb, "vec_id", "embedding")
            .select(_sign_bucket(F.col("v"), bits).alias("b"))
            .groupBy("b")
            .count()
            .select(F.sum(F.col("count") * F.col("count")).alias("s"))
            .collect()[0]
            .s
        )

    qids = {r.vec_id for r in queries.select("vec_id").collect()}
    e_sub = {p for p in e if p[0] in qids}
    recalls = {}
    for bits in (4, 6):
        got = {
            (r.query_id, r.vec_id)
            for r in ann_topk(emb, queries, k=TOP_K, bits=bits).collect()
        }
        recalls[bits] = len(e_sub & got) / max(len(e_sub), 1)
    # narrower buckets see more candidates -> at least as much recall;
    # both settings stay above the floor at this corpus size
    assert recalls[4] >= recalls[6] >= 0.15, recalls
    # sum of squared bucket sizes ~ candidate volume: must shrink with
    # bits - the knob really trades volume for recall
    assert bucket_sizes(6) < bucket_sizes(4)


def test_ann_auto_bits_path(spark, sf_oracle):
    """bits=None derives the width from the corpus and still returns a
    valid, recall-bearing result."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        ann_bits_for,
        ann_topk,
        cosine_topk,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.orderBy("vec_id").limit(10)
    auto = ann_topk(emb, queries, k=5, bits=None).collect()
    explicit = ann_topk(
        emb, queries, k=5, bits=ann_bits_for(emb.count(), 64)
    ).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
    assert len(auto) > 0


def test_ivf_cells_for_scaling():
    from optimal_parallel_fp_growth_spark.operators.similarity import ivf_cells_for

    assert ivf_cells_for(100) == 16          # min clamp
    assert ivf_cells_for(10**6) == 1000      # sqrt rule
    assert ivf_cells_for(10**9) == 4096      # max clamp (broadcast-sized)


def test_ivf_auto_cells_path(spark, sf_oracle):
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        ivf_cells_for,
        ivf_topk,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    auto = sorted(map(tuple, ivf_topk(emb, queries, k=5, n_cells=None).collect()))
    explicit = sorted(
        map(tuple, ivf_topk(emb, queries, k=5, n_cells=ivf_cells_for(emb.count())).collect())
    )
    assert auto == explicit and len(auto) > 0


def test_ann_and_ivf_arrow_match_sql(spark, sf_small):
    """impl='arrow' (per-query matmul scoring) must return identical
    rows to the SQL window path for both bucketed variants."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        ann_topk,
        ivf_topk,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    for fn in (ann_topk, ivf_topk):
        a = sorted(map(tuple, fn(emb, queries, k=5).collect()))
        b = sorted(map(tuple, fn(emb, queries, k=5, impl="arrow").collect()))
        assert a == b and a, fn.__name__


def test_ann_against_index_matches_ivf_topk(spark):
    """Persisted-index probe reproduces the one-shot IVF exactly (same
    seeded centroids over the same corpus), and drops nothing early:
    the index survives multiple probes."""
    import uuid

    from pyspark.sql import functions as F_

    from optimal_parallel_fp_growth_spark.operators.similarity import (
        ann_against_index,
        build_ivf_index,
        drop_ivf_index,
        ivf_topk,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F_.col("vec_id") % 50 == 0)
    want = {tuple(r) for r in ivf_topk(emb, queries, k=5).collect()}
    name = f"opfpg_ivf_test_{uuid.uuid4().hex}"
    try:
        build_ivf_index(emb, name)
        got = {tuple(r) for r in ann_against_index(queries, name, k=5).collect()}
        assert got == want and len(want) > 0
        # second probe against the SAME index (the amortization point)
        q2 = emb.where(F_.col("vec_id") % 75 == 0)
        got2 = {tuple(r) for r in ann_against_index(q2, name, k=5).collect()}
        want2 = {tuple(r) for r in ivf_topk(emb, q2, k=5).collect()}
        assert got2 == want2 and len(want2) > 0
    finally:
        drop_ivf_index(spark, name)


def test_knn_ivf_index_registry_drops_tables(spark):
    from optimal_parallel_fp_growth_spark.queries_vectors import q_knn_ivf_index

    before = {t.name for t in spark.catalog.listTables()}
    out = q_knn_ivf_index(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    assert {t.name for t in spark.catalog.listTables()} == before


def test_hyperplane_cosines_agree_with_exact(spark, sf_oracle, exact_and_ann):
    """knn_hyperplane's ground-truth pin (round-9 rotation): for pairs
    surfaced by both the hyperplane tier and the exact tier the scored
    cosine is identical, and recall holds the ANN floor — the
    hyperplane family approximates the candidate set, never the
    metric."""
    from optimal_parallel_fp_growth_spark.queries_vectors import (
        q_knn_hyperplane,
    )

    exact, _ = exact_and_ann
    e = {(r.query_id, r.vec_id): r.cosine for r in exact}
    hyp = q_knn_hyperplane(spark, sf_oracle).collect()
    assert hyp
    for r in hyp:
        key = (r.query_id, r.vec_id)
        if key in e:
            assert e[key] == r.cosine
    recall = len(e.keys() & {(r.query_id, r.vec_id) for r in hyp}) / len(e)
    assert recall >= 0.15, f"hyperplane recall collapsed: {recall:.3f}"


def test_quantize_embeddings_matches_numpy(spark):
    """GROUND_TRUTH pin for `embedding_quantize`: scales and every
    int8 code recomputed by numpy on the real sf0.001 embeddings,
    plus the all-zero-vector edge and the reconstruction bound."""
    import numpy as np

    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.operators.similarity import (
        quantize_embeddings,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = {
        r.vec_id: (r.scale, list(r.codes))
        for r in quantize_embeddings(emb).select(
            "vec_id", "scale", "codes"
        ).collect()
    }
    src = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
           for r in emb.collect()}
    assert set(got) == set(src)
    for vid, x in src.items():
        s = float(np.max(np.abs(x)))
        if s == 0.0:
            exp = [0] * len(x)
        else:
            # HALF_UP (away from zero), matching Spark/DuckDB round()
            y = x / s * 127.0
            exp = np.sign(y) * np.floor(np.abs(y) + 0.5)
            exp = exp.astype(int).tolist()
        gs, gc = got[vid]
        assert gs == s and gc == exp, vid
        if s > 0:
            recon = np.asarray(exp) * s / 127.0
            assert np.max(np.abs(x - recon)) <= s / 254.0 * 1.0000001
    # the all-zero edge, explicitly
    z = spark.createDataFrame(
        [(99, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(z).collect()[0]
    assert r.scale == 0.0 and list(r.codes) == [0, 0, 0]
