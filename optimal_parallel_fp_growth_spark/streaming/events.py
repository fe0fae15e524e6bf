"""Structured Streaming over the events table (driver north star;
SURVEY §2.8 — the reference declares spark-streaming in its pom but
never uses it; this module is the Spark-native realization).

``stream_events`` treats the events parquet as a file stream (same
nano-timestamp handling as the batch catalog); the transformations are
the streaming twins of operators/sessions.py:

- ``windowed_counts``  — tumbling event-time window + watermark: the
  canonical late-data-tolerant aggregation. State is (window, type)
  keyed — shards across executors, no driver state.
- ``session_counts``   — native ``session_window`` gap sessions per
  user: the streaming form of ``sessionize`` (state per user-session,
  closed by watermark at scale).

Tests drive both with ``trigger(availableNow=True)`` into a memory sink
and check agreement with the equivalent batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.time import wall_utc_timestamp
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table with proper µs LTZ
    timestamps — the same per-generation ``ts`` normalization as
    ``catalog.load_table`` (legacy nanos-as-long vs current naive-µs
    parquet), applied to a streaming scan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # File-stream sources need a directory; glob down to the events file.
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Session-tz-independent wall-as-UTC normalization (see
    # functions/time.py::wall_utc_timestamp — to_utc_timestamp would
    # shift NTZ values by the session offset).
    return raw.withColumn("ts", wall_utc_timestamp(raw, "ts"))


def windowed_counts(
    events: DataFrame, window: str = "6 hours", watermark: str = "1 day"
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark for late
    data. → (window_start_epoch, event_type, n_events, sum_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_distinct_sketch(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 day",
    lgk: int = 12,
) -> DataFrame:
    """Tumbling-window APPROX distinct users per event_type via the
    same mergeable HLL sketches as ``operators/sketches.py`` — the
    streaming member of the sketch-table family. State per open window
    is one ~2^lgk-byte sketch per (window, event_type), merged
    incrementally across micro-batches by the streaming aggregation;
    an exact streaming count(DISTINCT) would instead have to hold the
    full per-window user SET in state (unbounded per key) — which
    Structured Streaming rejects outright. Below the coupon threshold
    the estimate is exact (same property the batch oracle pins).
    → (window_start_epoch, event_type, est_users, n_events)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(lgk))
            ).alias("est_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "est_users",
            "n_events",
        )
    )


def batch_windowed_distinct(
    events: DataFrame, window: str = "6 hours"
) -> DataFrame:
    """Batch twin of :func:`windowed_distinct_sketch` with EXACT
    distinct counts — equality holds wherever the sketch is in its
    exact regime (small per-window cardinalities)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.countDistinct("user_id").alias("est_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "est_users",
            "n_events",
        )
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach a static dimension frame
    to a streaming fact frame. Structured Streaming plans this as a
    per-micro-batch broadcast/hash join against the static side — no
    stream state, no watermark needed (unlike stream-stream joins),
    and the static side is re-resolvable per batch, so a dimension
    table backed by a path sees updates between batches. The standard
    shape for user/geo/catalog attribute attachment before windowed
    aggregation at any scale — the stream side never exchanges for
    the join when the dimension broadcasts."""
    return events.join(F.broadcast(dim), on, how)


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Native STREAM-STREAM interval join: correlate two event streams
    per user where the right event follows the left within
    ``max_gap`` (e.g. purchases attributed to the preceding view).
    Both sides carry watermarks and the join condition bounds right.ts
    to [left.ts, left.ts + max_gap], so Structured Streaming can
    evict buffered rows once the watermark passes their join window —
    bounded state, the requirement stream-stream joins add over
    stream-static ones. → (user_id, left_event_id, right_event_id,
    left_ts, right_ts, gap_seconds).

    Inputs must expose (user_id, event_id, ts); pre-filter each side
    to its event type before calling."""
    l = (
        left.withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("left_event_id"),
            F.col("ts").alias("left_ts"),
        )
    )
    r = (
        right.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("event_id").alias("right_event_id"),
            F.col("ts").alias("right_ts"),
        )
    )
    cond = (
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond).select(
        "user_id",
        "left_event_id",
        "right_event_id",
        F.col("left_ts").cast("long").alias("left_ts"),
        F.col("right_ts").cast("long").alias("right_ts"),
        (F.col("right_ts").cast("long") - F.col("left_ts").cast("long")).alias(
            "gap_seconds"
        ),
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 day"
) -> DataFrame:
    """Native session-window aggregation per user (streaming twin of
    operators.sessions.sessionize). → (user_id, start_epoch, end_epoch,
    n_events)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("start_epoch"),
            F.col("w.end").cast("long").alias("end_epoch"),
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain an (aggregated) stream into an in-memory table with
    availableNow — the batch-verifiable execution path used by tests."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def batch_windowed_counts(
    spark: SparkSession, sf_dir: str, window: str = "6 hours"
) -> DataFrame:
    """Batch plan with identical semantics to ``windowed_counts`` (no
    late data in a static file ⇒ the watermark is a no-op)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming deduplication on ``keys`` with event-time-bounded
    state (round 14): the first row seen for a key is emitted, later
    rows are dropped; the watermark EVICTS key state older than the
    horizon, so memory is bounded by the key arrival rate × watermark
    — the property that makes dedup runnable on an unbounded stream.
    (A duplicate arriving later than the watermark can re-emit: the
    standard streaming-dedup contract; tighten by widening the
    watermark.) Cross-micro-batch dedup is the load-bearing part —
    state persists between triggers (pinned in
    test_streaming.py::test_stream_dedup_drops_cross_batch_duplicates).

    Batch twin for key-set / first-touch semantics:
    ``operators/sessions.py::first_touch`` (deterministic min-(ts,
    event_id) representative; a micro-batch may contain its own
    duplicates in arbitrary order, so only the KEY SET is comparable
    between the two paths, not the surviving row's payload)."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark("ts", watermark).dropDuplicates(keys)
