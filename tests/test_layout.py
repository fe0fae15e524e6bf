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


def test_scan_partition_probe_is_memoized_per_source(spark, sf_small, tmp_path):
    """r18 (VERDICT r17 task #7): the partition probe must not build a
    second physical plan per fan_out_scan call — one probe per
    (session, file set), later calls hit the memo."""
    from optimal_parallel_fp_growth_spark.functions import layout
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    layout._SCAN_PARTS_MEMO.clear()
    docs = load_table(spark, sf_small, "documents")
    n1 = layout._scan_partitions(docs.select("doc_id"))
    assert len(layout._SCAN_PARTS_MEMO) == 1
    # the SAME shape rebuilt hits the same entry (canonicalized
    # semantic hash — fresh exprIds don't defeat the memo)
    n2 = layout._scan_partitions(
        load_table(spark, sf_small, "documents").select("doc_id")
    )
    assert n2 == n1
    assert len(layout._SCAN_PARTS_MEMO) == 1
    # memo returns what the direct probe would
    assert n1 == docs.select("doc_id").rdd.getNumPartitions()
    # a DIFFERENT file set gets its own entry
    p = str(tmp_path / "other")
    spark.range(0, 10).coalesce(1).write.parquet(p)
    other = spark.read.parquet(p)
    assert layout._scan_partitions(other) == 1
    assert len(layout._SCAN_PARTS_MEMO) == 2
    # fileless (in-memory) frames fall back unmemoized
    local = spark.range(0, 10)
    layout._scan_partitions(local)
    assert len(layout._SCAN_PARTS_MEMO) == 2


def test_memo_never_shadows_a_repartitioned_frame(spark, sf_small):
    """Regression (r18): keying the memo on the file set ALONE let a
    raw-scan probe (1 partition on the single-split fixture) shadow an
    already-repartitioned frame over the same files, so fan_out_scan
    injected a spurious second exchange (surfaced as
    test_bloom_decontaminate_plan_contract failing — 6 hash exchanges —
    whenever the minhash plan test had primed the memo first). The
    plan-shape component of the key keeps the two separate."""
    from optimal_parallel_fp_growth_spark.functions import layout
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    layout._SCAN_PARTS_MEMO.clear()
    raw = load_table(spark, sf_small, "documents").select("doc_id", "text")
    assert layout._scan_partitions(raw) == 1  # primes the memo
    wide = raw.repartition(8)
    # the repartitioned frame must probe as ALREADY healthy...
    assert layout._scan_partitions(wide) == 8
    # ...so fan_out_scan is a no-op on it (no spurious exchange)
    assert fan_out_scan(wide, "doc_id", target=8) is wide
