"""Incremental dedup: persisted LSH index + new-batch probe
(operators/dedup.py::build_minhash_index / dedup_against_index).

Differential against the full-corpus LSH run restricted to the same
batch x corpus cut, plan shape (index side never exchanged), and index
lifecycle (registry wrapper drops its session-temp tables)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators import dedup
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_matches_full_lsh_cut(spark):
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    name = f"opfpg_inc_test_{uuid.uuid4().hex}"
    try:
        dedup.build_minhash_index(corpus, name)
        got = {
            (r.doc_id, r.dup_of, r.jaccard_est)
            for r in dedup.dedup_against_index(
                batch, name, threshold=0.0625
            ).collect()
        }
    finally:
        dedup.drop_minhash_index(spark, name)
    # reference: full-corpus signature-estimate pairs, cut to batch x corpus
    full = dedup.minhash_lsh_pairs(
        docs, threshold=0.0625, verify="signatures"
    ).collect()
    want = set()
    for r in full:
        a, b = r.doc_a, r.doc_b
        if a % 4 == 0 and b % 4 != 0:
            want.add((a, b, r.jaccard))
        elif b % 4 == 0 and a % 4 != 0:
            want.add((b, a, r.jaccard))
    assert got == want and len(want) > 0


def test_index_probe_join_exchanges_only_batch_side(spark):
    """The point of the bucketed index: the band-candidate join must
    not exchange the index side."""
    docs = load_table(spark, SF_DIR, "documents")
    name = f"opfpg_inc_plan_{uuid.uuid4().hex}"
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dedup.build_minhash_index(docs.where(F.col("doc_id") % 4 != 0), name)
        probe = spark.createDataFrame(
            [(1_000_001, "a"), (1_000_002, "b")], "doc_id long, band_key string"
        )
        joined = spark.table(f"{name}_bands").join(probe, "band_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        dedup.drop_minhash_index(spark, name)


def test_registry_entry_drops_its_index_tables(spark):
    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_dedup_incremental,
    )

    before = {t.name for t in spark.catalog.listTables()}
    out = q_dedup_incremental(spark, SF_DIR)
    assert out.count() >= 0  # materialized result survives the drop
    assert {t.name for t in spark.catalog.listTables()} == before
