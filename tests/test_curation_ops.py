"""stratified_sample / events_top_users / label_centroids — semantics
plus the WindowGroupLimit plan pins that carry their 100-TB story."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.sampling import stratified_sample
from optimal_parallel_fp_growth_spark.operators.similarity import label_centroids


def test_stratified_sample_exact_counts_and_small_strata(spark):
    rows = [(i, "big") for i in range(100)] + [(100 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, "source", 10)
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by == {"big": 10, "tiny": 3}  # exact n, small stratum keeps all


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    rows = [(i, str(i % 4)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r.doc_id for r in stratified_sample(df, "source", 5).collect())
    b = sorted(
        r.doc_id for r in stratified_sample(df.repartition(13), "source", 5).collect()
    )
    assert a == b


def test_stratified_sample_validation(spark):
    df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    with pytest.raises(ValueError, match="n_per_stratum"):
        stratified_sample(df, "source", 0)


def test_stratified_sample_plan_two_phase(spark):
    df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    plan = (
        stratified_sample(df, "source", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("WindowGroupLimit") == 2 and "Partial" in plan


def test_weighted_sample_counts_determinism_and_bias(spark):
    from optimal_parallel_fp_growth_spark.operators.sampling import weighted_sample

    rows = [(i, "a", 1.0 if i < 500 else 100.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    out = weighted_sample(df, "w", 50, by="lang")
    got = [r.doc_id for r in out.collect()]
    assert len(got) == 50
    # A-ES: P(high-weight row ranks above low-weight row) = 100/101 —
    # with 500 rows at weight 100 vs 500 at weight 1, the top-50 is
    # overwhelmingly heavy rows (md5-u is effectively uniform)
    heavy = sum(1 for d in got if d >= 500)
    assert heavy >= 45, f"only {heavy}/50 heavy rows sampled"
    # deterministic + partition-invariant
    again = [r.doc_id for r in weighted_sample(df.repartition(17), "w", 50, by="lang").collect()]
    assert sorted(got) == sorted(again)


def test_weighted_sample_global_and_validation(spark):
    from optimal_parallel_fp_growth_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(-5, 20)], "doc_id long, w double"
    )
    out = weighted_sample(df, "w", 10)  # global top-10, w<=0 excluded
    ids = {r.doc_id for r in out.collect()}
    assert len(ids) == 10 and all(i > 0 for i in ids)
    with pytest.raises(ValueError, match="n must be"):
        weighted_sample(df, "w", 0)


def test_weighted_sample_grouped_plan_two_phase(spark):
    from optimal_parallel_fp_growth_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, "a", 1.0)], "doc_id long, lang string, w double")
    plan = (
        weighted_sample(df, "w", 5, by="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("WindowGroupLimit") == 2 and "Partial" in plan


def test_label_centroids_values(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [3.0, 2.0], 0), (3, [5.0, 5.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    got = {(r.label, r.pos): (r.mean_val, r.n_vectors)
           for r in label_centroids(emb).collect()}
    assert got == {
        (0, 0): (2.0, 2), (0, 1): (1.0, 2),
        (1, 0): (5.0, 1), (1, 1): (5.0, 1),
    }


def test_events_top_users_plan_two_phase(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_events import q_events_top_users

    df = q_events_top_users(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") == 2 and "Partial" in plan
    # per-type ranks are dense from 1 and respect count order
    rows = df.where(F.col("event_type") == df.select("event_type").first()[0])
    got = sorted((r.rank, r.cnt) for r in rows.collect())
    assert [rk for rk, _ in got] == list(range(1, len(got) + 1))
    cnts = [c for _, c in got]
    assert cnts == sorted(cnts, reverse=True)


def test_curate_corpus_invariants(spark, sf_oracle):
    from optimal_parallel_fp_growth_spark.plans.curate import curate_corpus
    from optimal_parallel_fp_growth_spark.operators.dedup import deduped_corpus
    from optimal_parallel_fp_growth_spark.operators.textops import quality_score
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_oracle, "documents")
    out = curate_corpus(docs).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))  # each doc packed at most once

    surv = {r.doc_id for r in deduped_corpus(docs).collect()}
    qual = {r.doc_id: r.quality for r in quality_score(docs).collect()}
    for r in out:
        assert r.doc_id in surv and qual[r.doc_id] >= 0.5

    # packs are contiguous in doc_id order within a source: pack_id
    # non-decreasing when rows sorted by (source, doc_id)
    by_src = {}
    for r in sorted(out, key=lambda r: (r.source, r.doc_id)):
        assert by_src.get(r.source, 0) <= r.pack_id
        by_src[r.source] = r.pack_id


def test_mix_temperature_matches_reference(spark, sf_oracle):
    """Twin differential for the `mix_temperature` registry entry
    (tests/test_registry_order.py::TWINS): the full keep-rate formula
    and md5-bucket keep rule recomputed independently in pure Python
    must select EXACTLY the rows the Spark plan selects."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from optimal_parallel_fp_growth_spark.operators.sampling import (
        BUCKETS,
        mix_by_temperature,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_oracle, "documents")
    target, alpha = 300, 0.5
    got = {
        r.doc_id
        for r in mix_by_temperature(docs, target, alpha=alpha).collect()
    }

    rows = docs.select("doc_id", "source").collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r.source] = counts.get(r.source, 0) + 1
    tot = sum(c**alpha for c in counts.values())
    keep_below = {
        s: int(
            Decimal(min(1.0, target * (c**alpha) / tot / c) * BUCKETS)
            .quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        for s, c in counts.items()
    }
    want = {
        r.doc_id
        for r in rows
        if int(hashlib.md5(f"mixtemp:{r.doc_id}".encode()).hexdigest()[:8], 16)
        % BUCKETS
        < keep_below[r.source]
    }
    assert got == want and got
