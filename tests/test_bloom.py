"""Bloom-filter join pruning (operators/bloom.py): exactness vs plain
joins, zero false negatives, fpp envelope, partition-merge identity,
and the no-big-side-exchange plan contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_params_for,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def big(spark):
    # ids 0..1999; key column with some nulls
    return (
        spark.range(2000)
        .select(
            F.col("id").alias("row_id"),
            F.when(F.col("id") % 97 == 0, None)
            .otherwise(F.concat(F.lit("k"), F.col("id") % 500))
            .alias("key"),
            (F.col("id") * 3).alias("payload"),
        )
    )


@pytest.fixture(scope="module")
def keys(spark):
    # 120 member keys k0..k119, with duplicates and a null
    return (
        spark.range(240)
        .select(
            F.when(F.col("id") == 0, None)
            .otherwise(F.concat(F.lit("k"), F.col("id") % 120))
            .alias("key")
        )
    )


def test_params_sizing():
    m, k = bloom_params_for(1000, 0.01)
    assert 9000 < m < 11000 and 6 <= k <= 8
    m2, _ = bloom_params_for(1, 0.5)
    assert m2 >= 64  # floor


def test_no_false_negatives(spark, keys):
    bf = bloom_build(keys, "key", fpp=0.01)
    members = keys.where(F.col("key").isNotNull()).distinct()
    flagged = members.withColumn("m", bf.might_contain(spark, "key"))
    assert flagged.where(~F.col("m")).count() == 0


def test_fpp_envelope(spark):
    # 2000 members, probe 4000 disjoint keys: observed fp rate should
    # be within a few multiples of the target (binomial slack)
    members = spark.range(2000).select(F.concat(F.lit("in"), "id").alias("key"))
    probes = spark.range(4000).select(F.concat(F.lit("out"), "id").alias("key"))
    bf = bloom_build(members, "key", fpp=0.01)
    fp = probes.withColumn("m", bf.might_contain(spark, "key")).where("m").count()
    assert fp / 4000 < 0.05


def test_partition_merge_identity(spark, keys):
    # bitmap is independent of input partitioning (OR-merge is exact)
    a = bloom_build(keys.coalesce(1), "key", fpp=0.01, n_items=120)
    b = bloom_build(keys.repartition(7), "key", fpp=0.01, n_items=120)
    assert a.m_bits == b.m_bits and a.k == b.k
    assert (a.words == b.words).all()


def test_anti_join_exact(big, keys):
    got = bloom_anti_join(big, keys, "key", fpp=0.02)
    want = big.join(keys.select("key").distinct(), "key", "left_anti")
    assert got.count() == want.count()
    diff = got.select("row_id").exceptAll(want.select("row_id"))
    assert diff.count() == 0
    # null keys never match → survive the anti join (join semantics)
    assert got.where(F.col("key").isNull()).count() == big.where(
        F.col("key").isNull()
    ).count()


def test_semi_join_exact(big, keys):
    got = bloom_semi_join(big, keys, "key", fpp=0.02)
    want = big.join(keys.select("key").distinct(), "key", "left_semi")
    assert got.count() == want.count()
    assert got.select("row_id").exceptAll(want.select("row_id")).count() == 0
    assert got.where(F.col("key").isNull()).count() == 0


def test_prebuilt_bloom_reuse(spark, big, keys):
    bf = bloom_build(keys, "key", fpp=0.02)
    a = bloom_anti_join(big, keys, "key", bloom=bf)
    b = bloom_semi_join(big, keys, "key", bloom=bf)
    assert a.count() + b.count() == big.count()


def test_plan_big_side_not_exchanged(big, keys):
    """The definite-non-member branch must reach the output with no
    Exchange; only the suspect branch joins."""
    plan = bloom_anti_join(
        big, keys, "key", fpp=0.02, broadcast_verify=True
    )._jdf.queryExecution().executedPlan().toString()
    # exactly one join, and it is broadcast (the verify stage)
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    # the only hash exchange is the keys-side distinct feeding the
    # broadcast build — the fact side never partitions
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Exchange rangepartitioning" not in plan


def test_property_membership_arbitrary_keys(spark):
    """Property: for arbitrary unicode key sets, bloom semi/anti joins
    partition the fact side exactly like the plain joins."""
    from hypothesis import given, settings, strategies as st

    key_strat = st.lists(
        st.text(min_size=0, max_size=12), min_size=1, max_size=30
    )

    @settings(max_examples=5, deadline=None)
    @given(members=key_strat, probes=key_strat)
    def run(members, probes):
        mdf = spark.createDataFrame([(m,) for m in members], "key string")
        pdf = spark.createDataFrame(
            [(i, p) for i, p in enumerate(probes)], "row_id long, key string"
        )
        semi = bloom_semi_join(pdf, mdf, "key", fpp=0.05)
        anti = bloom_anti_join(pdf, mdf, "key", fpp=0.05)
        got_in = {r.row_id for r in semi.collect()}
        got_out = {r.row_id for r in anti.collect()}
        mset = set(members)
        want_in = {i for i, p in enumerate(probes) if p in mset}
        assert got_in == want_in
        assert got_out == set(range(len(probes))) - want_in

    run()
