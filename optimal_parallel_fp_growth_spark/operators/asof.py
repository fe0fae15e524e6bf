"""As-of (point-in-time) join — an operator Spark SQL lacks natively
(driver north star: custom operators as compositions of built-in
DataFrame ops when semantics allow).

``asof_join_last_event``: attach to every event the same user's most
recent marker-type event AT OR BEFORE this event's timestamp (e.g.
last 'purchase' up to and including this click's instant — inclusive,
see Tiebreak below). Implemented as the union-tag trick, NOT a range
join:

    union(left tagged, right tagged)
      → window last_value(right cols, ignoreNulls)
          over (partition user) (order time, tiebreaks) rows unbounded
            preceding → current
      → keep left rows

One shuffle on the partition key, linear in |left| + |right|, no
pair-explosion — the shape that survives 100 TB where a naive
range-condition join degenerates to a per-key cross product. DuckDB's
native ASOF JOIN is the oracle.

Tiebreak: right rows at the exact same timestamp sort BEFORE left rows
(marker flag asc), making the join inclusive (ts_right <= ts_left) like
DuckDB's ``ON a.ts >= b.ts``; same-ts same-user events order by
event_id so the result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_last_event(
    events: DataFrame, marker_type: str = "purchase"
) -> DataFrame:
    """→ one row per non-marker event: (event_id, user_id, ts_epoch,
    event_type, last_marker_ts_epoch, sec_since_marker) with nulls when
    no marker precedes."""
    base = events.select(
        "event_id", "user_id", "event_type", F.col("ts").cast("long").alias("ts_epoch")
    )
    left = base.where(F.col("event_type") != marker_type).withColumn(
        "is_marker", F.lit(1)
    )
    right = (
        base.where(F.col("event_type") == marker_type)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "ts_epoch",
            F.lit(0).alias("is_marker"),
        )
    )
    tagged = left.unionByName(right).withColumn(
        "marker_ts", F.when(F.col("is_marker") == 0, F.col("ts_epoch"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch", "is_marker", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = tagged.withColumn(
        "last_marker_ts_epoch", F.last("marker_ts", ignorenulls=True).over(w)
    )
    return joined.where(F.col("is_marker") == 1).select(
        "event_id",
        "user_id",
        "event_type",
        "ts_epoch",
        "last_marker_ts_epoch",
        (F.col("ts_epoch") - F.col("last_marker_ts_epoch")).alias("sec_since_marker"),
    )
