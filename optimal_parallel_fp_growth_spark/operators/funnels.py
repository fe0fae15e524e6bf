"""Funnel and cohort-retention analytics over the events table —
ordered-sequence operator classes the engine otherwise lacks (no
reference counterpart; driver north star).

Both are single-input, shuffle-bounded designs:

- ``funnel_counts`` computes ordered-step completion in ONE shuffle:
  events collapse to one row per user carrying a sorted timestamp list
  per step (map-side partial aggregation), then the sequential
  "first step-i time strictly after step-(i-1)" walk runs as
  higher-order filter/element_at over those small per-user arrays —
  no self-joins, no per-step shuffle. Per-user arrays are bounded by
  that user's event count for the step types, the same invariant
  sessionization already relies on.
- ``cohort_retention`` is two aggregations (first-seen day per user,
  then distinct users per (cohort, day-offset)) — the standard
  retention triangle, both shuffles on user/cohort keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_SEC = 86400


def funnel_counts(
    events: DataFrame, steps: Sequence[str] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered-funnel completion counts: a user completes step i when
    some step-i event is STRICTLY LATER than the earliest qualifying
    step-(i-1) completion time (the classic unordered-tiebreak-free
    funnel). → (step_idx, step, n_users), where n_users is the number
    of users whose first i steps occur in order.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    per_user = events.groupBy("user_id").agg(
        *[
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("event_type") == s, F.col("ts").cast("long")
                    )
                )
            ).alias(f"ts{i}")
            for i, s in enumerate(steps)
        ]
    )
    # sequential walk: t0 = first step-0 ts; ti = first step-i ts > t(i-1).
    # try_element_at: ANSI mode (Spark 4 default) makes element_at THROW
    # on an empty array; users missing a step must yield null instead.
    t = F.try_element_at(F.col("ts0"), F.lit(1))
    completed = per_user.withColumn("t0", t)
    for i in range(1, len(steps)):
        prev = F.col(f"t{i - 1}")
        nxt = F.try_element_at(
            F.filter(F.col(f"ts{i}"), lambda x: x > prev), F.lit(1)
        )
        completed = completed.withColumn(f"t{i}", nxt)
    counts = completed.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    # one row per step (tiny pivot of a 1-row aggregate)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("step_idx"),
                    F.lit(s).alias("step"),
                    F.col(f"n{i}").alias("n_users"),
                )
                for i, s in enumerate(steps)
            ]
        )
    )
    return counts.select(rows.alias("r")).select("r.step_idx", "r.step", "r.n_users")


def cohort_retention(events: DataFrame, max_offset_days: int = 14) -> DataFrame:
    """Retention triangle: users grouped by first-seen day (cohort),
    counted as retained on each later day they were active.
    → (cohort_epoch, day_offset, n_active) for offsets in
    [0, max_offset_days].
    """
    days = events.select(
        "user_id",
        (F.floor(F.col("ts").cast("long") / DAY_SEC) * DAY_SEC)
        .cast("long")
        .alias("day_epoch"),
    ).distinct()
    cohort = days.groupBy("user_id").agg(
        F.min("day_epoch").alias("cohort_epoch")
    )
    return (
        days.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_epoch",
            ((F.col("day_epoch") - F.col("cohort_epoch")) / DAY_SEC)
            .cast("long")
            .alias("day_offset"),
        )
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_epoch", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
