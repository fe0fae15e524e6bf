"""applyInPandasWithState first-seen dedup vs the equivalent batch plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.catalog import load_table
from optimal_parallel_fp_growth_spark.streaming.events import (
    run_to_memory,
    stream_events,
)
from optimal_parallel_fp_growth_spark.streaming.stateful import first_seen_dedup


def _multi_batch_stream(spark, sf_small, tmp_path, n_parts: int):
    """Split events into n_parts files so availableNow processes several
    micro-batches (maxFilesPerTrigger=1) — state must carry across them."""
    import time as _time

    from pyspark.sql import functions as F_

    from optimal_parallel_fp_growth_spark.functions.time import (
        epoch_seconds,
        wall_utc_timestamp,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_small}/events.parquet")
    # time-ordered slices written SEQUENTIALLY: the file source orders
    # batches by modification time, so arrival order == event-time order,
    # like a real stream. Quantile on a NUMERIC epoch projection —
    # approxQuantile rejects timestamp dtypes (and the legacy generation
    # stores bigint nanos, where epoch_seconds' cast("long") is a
    # monotone proxy, which is all the split needs).
    num = raw.withColumn("_ts_num", epoch_seconds(raw, "ts"))
    probs = [i / n_parts for i in range(1, n_parts)]
    qs = num.approxQuantile("_ts_num", probs, 0.0) if probs else []
    bounds = [float("-inf"), *qs, float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = num.where(
            (F_.col("_ts_num") > lo) & (F_.col("_ts_num") <= hi)
        ).drop("_ts_num")
        chunk.coalesce(1).write.mode("append").parquet(str(tmp_path / "ev_parts"))
        _time.sleep(0.05)
    schema = raw.schema
    st = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "ev_parts"))
    )
    # Same per-generation dtype dispatch as streaming/events.py.
    return st.withColumn("ts", wall_utc_timestamp(st, "ts"))


def _disordered_multi_batch_stream(
    spark, sf_small, tmp_path, order=(2, 0, 3, 1)
):
    """Time-quantile slices written DELIBERATELY OUT OF ORDER (arrival
    order != event-time order across micro-batches), followed by a
    far-future flush sentinel (user_id=-1, event_type='zzz_flush') that
    pushes the watermark past every real event so watermark-buffered
    state finalizes before availableNow terminates."""
    import time as _time

    from pyspark.sql import functions as F_

    from optimal_parallel_fp_growth_spark.functions.time import (
        epoch_seconds,
        wall_utc_timestamp,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_small}/events.parquet")
    n_parts = len(order)
    num = raw.withColumn("_ts_num", epoch_seconds(raw, "ts"))
    probs = [i / n_parts for i in range(1, n_parts)]
    qs = num.approxQuantile("_ts_num", probs, 0.0)
    bounds = [float("-inf"), *qs, float("inf")]
    slices = list(zip(bounds, bounds[1:]))
    dst = str(tmp_path / "ev_disorder")
    for idx in order:
        lo, hi = slices[idx]
        chunk = num.where(
            (F_.col("_ts_num") > lo) & (F_.col("_ts_num") <= hi)
        ).drop("_ts_num")
        chunk.coalesce(1).write.mode("append").parquet(dst)
        _time.sleep(0.05)
    ts_shift = (
        F_.col("ts") + F_.expr("INTERVAL 8000 DAYS")
        if dict(raw.dtypes)["ts"] != "bigint"
        else F_.col("ts") + F_.lit(8000 * 86_400 * 10**9)
    )
    flush = (
        raw.orderBy(F_.desc("ts"))
        .limit(1)
        .withColumn("ts", ts_shift)
        .withColumn("user_id", F_.lit(-1).cast("long"))
        .withColumn("event_type", F_.lit("zzz_flush"))
    )
    flush.coalesce(1).write.mode("append").parquet(dst)
    _time.sleep(0.05)
    st = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dst)
    )
    return st.withColumn("ts", wall_utc_timestamp(st, "ts"))


def test_first_seen_watermarked_disordered_matches_batch(
    spark, sf_small, tmp_path
):
    """Batches arrive OUT of event-time order — the contract the plain
    operator documents as undefined. The watermarked variant must still
    emit exactly the batch min(struct(ts, event_id, value)) per key."""
    from optimal_parallel_fp_growth_spark.streaming.stateful import (
        first_seen_dedup_watermarked,
    )

    st = first_seen_dedup_watermarked(
        _disordered_multi_batch_stream(spark, sf_small, tmp_path),
        delay="3650 days",
    )
    run_to_memory(st, "fs_wm", output_mode="update")
    got = {
        tuple(r)
        for r in spark.table("fs_wm").where(F.col("user_id") >= 0).collect()
    }

    ev = load_table(spark, sf_small, "events")
    want = {
        tuple(r)
        for r in ev.select(
            "user_id",
            "event_type",
            F.struct(
                F.col("ts").cast("long").alias("first_ts_epoch"),
                F.col("event_id").alias("first_event_id"),
                "value",
            ).alias("s"),
        )
        .groupBy("user_id", "event_type")
        .agg(F.min("s").alias("s"))
        .select(
            "user_id", "event_type", "s.first_ts_epoch", "s.first_event_id", "s.value"
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_funnel_watermarked_disordered_matches_batch(spark, sf_small, tmp_path):
    """Shuffled micro-batches (later slices first): the plain funnel
    machine would mis-set step times; the watermarked variant's final
    per-user progress must equal the batch walk, with monotone
    no-duplicate emissions."""
    from optimal_parallel_fp_growth_spark.operators.funnels import funnel_counts
    from optimal_parallel_fp_growth_spark.streaming.stateful import (
        funnel_progress_watermarked,
    )

    steps = ("view", "click", "purchase")
    st = funnel_progress_watermarked(
        _disordered_multi_batch_stream(spark, sf_small, tmp_path),
        steps,
        delay="3650 days",
    )
    run_to_memory(st, "funnel_wm", output_mode="update")
    prog = spark.table("funnel_wm").where(F.col("user_id") >= 0)
    final = {
        r.user_id: r.m
        for r in prog.groupBy("user_id")
        .agg(F.max("steps_completed").alias("m"))
        .collect()
    }
    batch = {
        r.step_idx: r.n_users
        for r in funnel_counts(load_table(spark, sf_small, "events"), steps).collect()
    }
    for i in range(len(steps)):
        stream_n = sum(1 for m in final.values() if m >= i + 1)
        assert stream_n == batch[i], (i, stream_n, batch[i])
    for r in (
        prog.groupBy("user_id", "steps_completed").count().where(F.col("count") > 1)
    ).collect():
        raise AssertionError(f"duplicate progress emission: {r}")


def test_checkpoint_restart_is_exactly_once(spark, sf_small, tmp_path):
    """File sink + checkpoint: stop after the first micro-batch, restart,
    feed more files — every input row lands in the sink exactly once."""
    import time as _time

    from pyspark.sql import functions as F_

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_small}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    half1 = raw.where(F_.col("event_id") % 2 == 0)
    half2 = raw.where(F_.col("event_id") % 2 == 1)
    half1.coalesce(1).write.mode("append").parquet(str(src))

    def run_once():
        st = spark.readStream.schema(raw.schema).parquet(str(src))
        q = (
            st.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # processes half1, then stops (availableNow)
    _time.sleep(0.05)
    half2.coalesce(1).write.mode("append").parquet(str(src))
    run_once()  # restart from checkpoint: must process ONLY half2

    got = spark.read.parquet(sink)
    assert got.count() == raw.count()  # no loss, no duplicates
    assert got.select("event_id").distinct().count() == raw.count()


def test_first_seen_dedup_matches_batch(spark, sf_small, tmp_path):
    st = first_seen_dedup(_multi_batch_stream(spark, sf_small, tmp_path, 4))
    run_to_memory(st, "first_seen", output_mode="update")
    got = {tuple(r) for r in spark.table("first_seen").collect()}

    ev = load_table(spark, sf_small, "events")
    want_df = (
        ev.select(
            "user_id",
            "event_type",
            F.struct(
                F.col("ts").cast("long").alias("first_ts_epoch"),
                F.col("event_id").alias("first_event_id"),
                "value",
            ).alias("s"),
        )
        .groupBy("user_id", "event_type")
        .agg(F.min("s").alias("s"))
        .select(
            "user_id", "event_type", "s.first_ts_epoch", "s.first_event_id", "s.value"
        )
    )
    want = {tuple(r) for r in want_df.collect()}
    assert got == want and len(want) > 0
    # dedup really dropped something
    assert len(want) < ev.count()


def test_first_seen_dedup_ttl_huge_matches_exact(spark, sf_small, tmp_path):
    """ttl far beyond the data's time span ⇒ no state ever expires and
    the TTL path emits exactly the exact-path first-seen set."""
    st = first_seen_dedup(
        _multi_batch_stream(spark, sf_small, tmp_path, 4), ttl="3650 days"
    )
    run_to_memory(st, "first_seen_ttl", output_mode="update")
    got = {tuple(r) for r in spark.table("first_seen_ttl").collect()}

    ev = load_table(spark, sf_small, "events")
    want = {
        tuple(r)
        for r in ev.select(
            "user_id",
            "event_type",
            F.struct(
                F.col("ts").cast("long").alias("first_ts_epoch"),
                F.col("event_id").alias("first_event_id"),
                "value",
            ).alias("s"),
        )
        .groupBy("user_id", "event_type")
        .agg(F.min("s").alias("s"))
        .select(
            "user_id", "event_type", "s.first_ts_epoch", "s.first_event_id", "s.value"
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_first_seen_dedup_ttl_expires_and_reemits(spark, sf_small, tmp_path):
    """ttl smaller than the inter-batch event-time gaps ⇒ seen-flags
    expire between micro-batches and recurring keys re-emit — the
    bounded-state trade documented on the operator. First emissions
    still match the exact path."""
    st = first_seen_dedup(
        _multi_batch_stream(spark, sf_small, tmp_path, 4), ttl="1 hour"
    )
    run_to_memory(st, "first_seen_exp", output_mode="update")
    rows = spark.table("first_seen_exp").collect()
    per_key: dict[tuple, list] = {}
    for r in rows:
        per_key.setdefault((r.user_id, r.event_type), []).append(
            (r.first_ts_epoch, r.first_event_id, r.value)
        )

    ev = load_table(spark, sf_small, "events")
    want_first = {
        (r.user_id, r.event_type): (r.first_ts_epoch, r.first_event_id, r.value)
        for r in ev.select(
            "user_id",
            "event_type",
            F.struct(
                F.col("ts").cast("long").alias("first_ts_epoch"),
                F.col("event_id").alias("first_event_id"),
                "value",
            ).alias("s"),
        )
        .groupBy("user_id", "event_type")
        .agg(F.min("s").alias("s"))
        .select(
            "user_id", "event_type", "s.first_ts_epoch", "s.first_event_id", "s.value"
        )
        .collect()
    }
    assert set(per_key) == set(want_first)
    for k, emissions in per_key.items():
        assert min(emissions) == want_first[k], k
    # the point of the test: expiry actually fired somewhere
    assert sum(len(v) for v in per_key.values()) > len(per_key)


def test_funnel_progress_matches_batch(spark, sf_small, tmp_path):
    from optimal_parallel_fp_growth_spark.operators.funnels import funnel_counts
    from optimal_parallel_fp_growth_spark.streaming.stateful import funnel_progress

    steps = ("view", "click", "purchase")
    st = funnel_progress(
        _multi_batch_stream(spark, sf_small, tmp_path, 4), steps
    )
    run_to_memory(st, "funnel_stream", output_mode="update")
    prog = spark.table("funnel_stream")
    # final per-user progress = max steps_completed emitted
    final = {
        r.user_id: r.m
        for r in prog.groupBy("user_id")
        .agg(F.max("steps_completed").alias("m"))
        .collect()
    }
    # batch reference: users completing >= i+1 steps per step i
    batch = {
        r.step_idx: r.n_users
        for r in funnel_counts(load_table(spark, sf_small, "events"), steps).collect()
    }
    for i in range(len(steps)):
        stream_n = sum(1 for m in final.values() if m >= i + 1)
        assert stream_n == batch[i], (i, stream_n, batch[i])
    # progress is monotone per user: emissions strictly increase
    for r in (
        prog.groupBy("user_id", "steps_completed").count().where(F.col("count") > 1)
    ).collect():
        raise AssertionError(f"duplicate progress emission: {r}")


def test_heavy_hitters_exact_when_capacity_covers(spark, sf_small, tmp_path):
    from optimal_parallel_fp_growth_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    st = heavy_hitters_stream(
        _multi_batch_stream(spark, sf_small, tmp_path, 4), capacity=100_000
    )
    run_to_memory(st, "hh_stream", output_mode="update")
    # capacity >= distinct users: Misra-Gries never decrements, counts are
    # exact and non-decreasing, so max emission per pair = final count —
    # and the certainty interval collapses (max_count == est_count).
    assert (
        spark.table("hh_stream")
        .where(F.col("max_count") != F.col("est_count"))
        .count()
        == 0
    )
    got = {
        (r.event_type, r.user_id): r.m
        for r in spark.table("hh_stream")
        .groupBy("event_type", "user_id")
        .agg(F.max("est_count").alias("m"))
        .collect()
    }
    want = {
        (r.event_type, r.user_id): r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_heavy_hitters_bounded_state_undercounts(spark, sf_small, tmp_path):
    from optimal_parallel_fp_growth_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    st = heavy_hitters_stream(
        _multi_batch_stream(spark, sf_small, tmp_path, 3), capacity=4
    )
    run_to_memory(st, "hh_small", output_mode="update")
    est = {
        (r.event_type, r.user_id): r.m
        for r in spark.table("hh_small")
        .groupBy("event_type", "user_id")
        .agg(F.max("est_count").alias("m"))
        .collect()
    }
    assert est, "stream emitted nothing"
    true = {
        (r.event_type, r.user_id): r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # Misra-Gries stored counts never exceed true counts (valid for
    # EVERY emission: est(t) <= true_so_far(t) <= true_final)
    for k, v in est.items():
        assert v <= true[k], (k, v, true[k])


def test_heavy_hitters_interval_brackets_truth(spark, sf_small, tmp_path):
    """Single micro-batch, bounded capacity: every emission IS the final
    summary, so the tracked certainty interval must bracket the true
    count: est_count <= true <= max_count (= est + decrements)."""
    from optimal_parallel_fp_growth_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    st = heavy_hitters_stream(
        _multi_batch_stream(spark, sf_small, tmp_path, 1), capacity=4
    )
    run_to_memory(st, "hh_interval", output_mode="update")
    rows = spark.table("hh_interval").collect()
    assert rows, "stream emitted nothing"
    true = {
        (r.event_type, r.user_id): r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    some_decrement = False
    for r in rows:
        k = (r.event_type, r.user_id)
        assert r.est_count <= true[k] <= r.max_count, (
            k,
            r.est_count,
            true[k],
            r.max_count,
        )
        some_decrement = some_decrement or r.max_count > r.est_count
    # capacity=4 << distinct users: decrements must actually have fired,
    # otherwise this test isn't exercising the interval at all.
    assert some_decrement
