"""fan_out_scan (r17, functions/layout.py) — the single-split scan
repair must WIDEN narrow inputs and be a literal no-op on healthy ones,
so the plan contracts in test_plan_quality.py stay true at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.layout import fan_out_scan


def test_healthy_input_passes_through_untouched(spark):
    df = spark.range(0, 1000).withColumn("k", F.col("id") % 7)
    wide = df.repartition(spark.sparkContext.defaultParallelism)
    # already at target parallelism → the SAME DataFrame object back
    # (no extra exchange in any downstream plan)
    assert fan_out_scan(wide, "k") is wide
    assert fan_out_scan(wide) is wide


def test_single_partition_input_is_widened(spark):
    one = spark.range(0, 1000).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    out = fan_out_scan(one)
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 1000


def test_keyed_fan_out_hash_partitions_on_the_key(spark):
    one = (
        spark.range(0, 500)
        .withColumn("k", (F.col("id") % 11).cast("int"))
        .coalesce(1)
    )
    out = fan_out_scan(one, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan and "hashpartitioning(k" in plan
    # row set unchanged
    assert out.groupBy().sum("id").collect()[0][0] == 500 * 499 // 2


def test_explicit_target_overrides_session_parallelism(spark):
    one = spark.range(0, 100).coalesce(1)
    assert fan_out_scan(one, target=3).rdd.getNumPartitions() == 3
    # target below the current width → untouched
    four = spark.range(0, 100).repartition(4)
    assert fan_out_scan(four, target=3) is four


def test_streaming_frames_pass_through(spark):
    stream = spark.readStream.format("rate").load()
    assert fan_out_scan(stream, "value") is stream
