"""applyInPandasWithState first-seen dedup vs the equivalent batch plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.catalog import load_table
from optimal_parallel_fp_growth_spark.streaming.events import (
    run_to_memory,
    stream_events,
)
from optimal_parallel_fp_growth_spark.streaming.stateful import first_seen_dedup


def test_first_seen_dedup_matches_batch(spark, sf_small):
    st = first_seen_dedup(stream_events(spark, sf_small))
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
