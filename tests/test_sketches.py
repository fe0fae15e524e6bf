"""Mergeable HLL sketch tables (operators/sketches.py): exact-mode
identity at small cardinality, accuracy envelope in the estimating
regime, merge-equals-single-shot, and parquet persistence roundtrip."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.sketches import (
    sketch_distinct,
    sketch_estimate,
    sketch_rollup,
)


@pytest.fixture(scope="module")
def tagged(spark):
    # 40k rows, 10 shards, per-shard distinct ~1.2k, global distinct 12k
    return spark.range(40000).select(
        (F.col("id") % 10).alias("shard"),
        (F.col("id") % 12000).alias("u"),
    )


def test_exact_mode_small_cardinality(spark):
    # under the coupon threshold the Datasketches estimate is exact
    df = spark.range(5000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 150).alias("u")
    )
    out = {
        r.g: r.est_distinct
        for r in sketch_rollup(sketch_distinct(df, ["g"], "u"), ["g"]).collect()
    }
    # ids 0..4999, g = id%4, u = id%150: each g sees u = (g + 4k) % 150;
    # gcd(4,150)=2 → 75 distinct per group
    assert out == {0: 75, 1: 75, 2: 75, 3: 75}


def test_estimating_regime_envelope(tagged):
    got = sketch_rollup(sketch_distinct(tagged, [], "u")).collect()[0]
    assert abs(got.est_distinct - 12000) / 12000 < 0.05
    assert got.n_rows == 40000


def test_merge_equals_single_shot(tagged):
    # union of per-shard sketches == sketching the whole input
    per_shard = sketch_distinct(tagged, ["shard"], "u")
    merged = sketch_rollup(per_shard).collect()[0]
    single = sketch_rollup(sketch_distinct(tagged, [], "u")).collect()[0]
    assert merged.est_distinct == single.est_distinct
    assert merged.n_rows == single.n_rows == 40000
    assert merged.n_sketches == 10


def test_persisted_sketch_roundtrip(tagged, tmp_path):
    # the artifact survives parquet: write dailies, read back, roll up,
    # and append a new batch without touching the old raw rows
    p = str(tmp_path / "sketches")
    sketch_distinct(tagged, ["shard"], "u").write.parquet(p)
    spark = tagged.sparkSession
    back = spark.read.parquet(p)
    assert sketch_rollup(back).collect()[0].est_distinct == sketch_rollup(
        sketch_distinct(tagged, ["shard"], "u")
    ).collect()[0].est_distinct
    # incremental: new batch with 1000 unseen users
    batch = spark.range(1000).select(
        F.lit(99).alias("shard"), (F.col("id") + 50000).alias("u")
    )
    appended = back.unionByName(sketch_distinct(batch, ["shard"], "u"))
    est = sketch_rollup(appended).collect()[0].est_distinct
    single = sketch_rollup(
        sketch_distinct(tagged.unionByName(batch.select("shard", "u")), [], "u")
    ).collect()[0].est_distinct
    assert est == single


def test_sketch_estimate_column(tagged):
    per_shard = sketch_distinct(tagged, ["shard"], "u")
    ests = per_shard.select("shard", sketch_estimate("sketch").alias("e")).collect()
    for r in ests:
        # per-shard distinct: u = id%12000, shard = id%10 → per shard
        # ids ≡ shard (mod 10); distinct u count = 12000/gcd... just
        # envelope-check against the exact per-shard count
        pass
    exact = {
        r.shard: r.d
        for r in tagged.groupBy("shard")
        .agg(F.countDistinct("u").alias("d"))
        .collect()
    }
    for r in ests:
        assert abs(r.e - exact[r.shard]) / exact[r.shard] < 0.05
