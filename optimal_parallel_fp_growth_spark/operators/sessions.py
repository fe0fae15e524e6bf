"""Event-stream batch operators over the ``events`` table: gap
sessionization, rolling windows, hierarchical rollups (driver north
star; SURVEY §2.8 notes these are absent from the reference).

Batch-first but streaming-ready: ``sessionize`` is the exact batch
semantics of a Structured-Streaming session window (see
streaming/sessions.py for the ``readStream`` twin); the partitionBy
(user_id) window means state is sharded by user — the shape that
scales to 100 TB of events (one shuffle, no driver state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps
    > ``gap_minutes``. → (user_id, session_idx, n_events, n_event_types,
    start_epoch, end_epoch, duration_sec, total_value)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = gap_minutes * 60
    new_session = (
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > gap_sec,
            1,
        )
        .otherwise(0)
    )
    tagged = events.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return tagged.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.min(F.col("ts").cast("long")).alias("start_epoch"),
        F.max(F.col("ts").cast("long")).alias("end_epoch"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_sec"
        ),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def rolling_stats(events: DataFrame, frame: int = 3) -> DataFrame:
    """Per-user rolling mean/max of ``value`` over the current + previous
    ``frame`` events (ordered by ts, event_id). → one row per event."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-frame, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_epoch"),
        F.round(F.avg("value").over(w), 6).alias("rolling_avg"),
        F.round(F.max("value").over(w), 6).alias("rolling_max"),
        F.count("*").over(w).alias("rolling_n"),
    )


def hourly_cube(events: DataFrame) -> DataFrame:
    """CUBE (hour-of-day, event_type): all four grouping combinations —
    the full grouping-sets surface (rollup covers the hierarchy case)."""
    return (
        events.select(
            F.hour("ts").alias("hour"), "event_type", "value"
        )
        .cube("hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.grouping("hour").cast("int").alias("g_hour"),
            F.grouping("event_type").cast("int").alias("g_type"),
        )
        .select(
            F.coalesce("hour", F.lit(-1)).alias("hour"),
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            "n_events",
            "avg_value",
            "g_hour",
            "g_type",
        )
    )


INTERVAL_BUCKET_SEC = 3600


def interval_join_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Range/interval join — assign every event to the session interval
    containing it. Spark has no native range-join optimization, and the
    naive theta join (ts BETWEEN start AND end) degenerates to a per-key
    cross product; this is the standard bucketized rewrite:

    1. explode each session interval into the hour buckets it covers,
    2. equi-join events on (user_id, hour bucket) — co-partitioned,
       shuffle bounded by intervals × covered-buckets, and
    3. filter exact containment.

    Sessions are maximal gap-separated intervals, so each event lands in
    exactly one. → (event_id, user_id, ts_epoch, session_idx)."""
    sessions = sessionize(events, gap_minutes).select(
        "user_id", "session_idx", "start_epoch", "end_epoch"
    )
    b = INTERVAL_BUCKET_SEC
    s_buckets = sessions.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("start_epoch") / b).cast("long"),
                (F.col("end_epoch") / b).cast("long"),
            )
        ),
    )
    ev = events.select(
        "event_id", "user_id", F.col("ts").cast("long").alias("ts_epoch")
    ).withColumn("bucket", (F.col("ts_epoch") / b).cast("long"))
    return (
        ev.join(s_buckets, ["user_id", "bucket"])
        .where(F.col("ts_epoch").between(F.col("start_epoch"), F.col("end_epoch")))
        .select("event_id", "user_id", "ts_epoch", "session_idx")
    )


def daily_rollup(events: DataFrame) -> DataFrame:
    """ROLLUP (day, event_type): per-cell, per-day, and grand totals,
    with explicit grouping flags so null cells are unambiguous."""
    day = F.date_trunc("day", "ts").cast("long").alias("day_epoch")
    return (
        events.select(day, "event_type", "value")
        .rollup("day_epoch", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.grouping("day_epoch").cast("int").alias("g_day"),
            F.grouping("event_type").cast("int").alias("g_type"),
        )
        # Null-free grouping cells: subtotal rows get sentinels so the
        # output sorts/compares cleanly everywhere.
        .select(
            F.coalesce("day_epoch", F.lit(-1)).alias("day_epoch"),
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            "n_events",
            "sum_value",
            "g_day",
            "g_type",
        )
    )


def first_touch(
    events: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Deterministic batch deduplication: keep each key's FIRST event
    by (ts, event_id) — the first-touch-attribution shape, and the
    batch twin of ``streaming.events.stream_dedup`` (which keeps the
    first row SEEN; the two agree on the key set, and on the payload
    whenever arrival order is event-time order).

    One window over the key partitioning — a single hash shuffle on
    the keys, no join. At 100 TB the alternative spellings are worse:
    ``dropDuplicates`` is non-deterministic under retries, and a
    min-(ts,event_id)-self-join shuffles twice."""
    from pyspark.sql import Window

    keys = keys or ["user_id", "event_type"]
    w = Window.partitionBy(*keys).orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
