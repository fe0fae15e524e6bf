"""Time-series resampling — regular-grid forward-fill and linear
interpolation, an operator Spark SQL lacks natively (like asof.py, built
as a composition of built-in ops; driver north star (a)).

``resample_events``: for every user, lay a fixed-step epoch grid across
their observed span and attach, per grid point, the last observed value
at or before it (forward fill + staleness) and the linear interpolation
between the surrounding observations.

Shape: the union-tag trick again (asof.py) — union the grid rows with
the (user, ts)-reduced observations, then ONE window partition per user
ordered by (ts, is_grid) serves both directions: ``last(value ignore
nulls) rows unbounded preceding → current`` is the forward fill,
``first(value ignore nulls) rows current → unbounded following`` is the
lookahead for interpolation. One shuffle on user_id total, linear in
|events| + |grid|, no range-join pair explosion — the same reason
asof.py survives 100 TB. Grid volume is bounded by span/step per user
(``sequence`` + explode), so executors materialize each user's grid
locally instead of the driver generating it.

Tiebreak: an observation at exactly a grid timestamp sorts BEFORE the
grid row (is_grid asc), so the fill is inclusive (at-or-before), and the
interpolation degenerates to that observation's value (factor 0) —
consistent on both counts.

Observations are first reduced to one row per (user, ts) by max event_id
(``max_by`` / DuckDB ``arg_max``) so concurrent same-second events
resolve deterministically on both the Spark and oracle sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RESAMPLE_STEP_SEC = 21600  # 6 h, aligned with events_windowed_counts


def resample_events(
    events: DataFrame,
    step_sec: int = RESAMPLE_STEP_SEC,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (user_id, grid_epoch, last_value, staleness_sec, interp_value),
    one row per user per grid step inside [ceil(min_ts), floor(max_ts)]
    grid-aligned bounds. last_value/interp_value rounded to 1e-6."""
    if step_sec <= 0:
        raise ValueError(f"step_sec must be positive, got {step_sec}")
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("long").alias("ts_epoch"),
        F.col(value_col).alias("value"),
        F.col(id_col).alias("event_id"),
    )
    per_ts = base.groupBy("user_id", "ts_epoch").agg(
        F.max_by("value", "event_id").alias("value")
    )
    step = F.lit(step_sec)
    bounds = per_ts.groupBy("user_id").agg(
        F.min("ts_epoch").alias("mn"), F.max("ts_epoch").alias("mx")
    )
    # integer ceil/floor alignment (epochs are non-negative)
    g_start = ((F.col("mn") + step - 1) / step).cast("long") * step
    g_end = (F.col("mx") / step).cast("long") * step
    grid = (
        bounds.where(g_start <= g_end)
        .select(
            "user_id",
            F.explode(F.sequence(g_start, g_end, step)).alias("ts_epoch"),
        )
        .select(
            "user_id",
            "ts_epoch",
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("is_grid"),
        )
    )
    tagged = per_ts.select(
        "user_id", "ts_epoch", F.col("value").cast("double"), F.lit(0).alias("is_grid")
    ).unionByName(grid)

    order = [F.asc("ts_epoch"), F.asc("is_grid")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("is_grid") == 0, F.col("ts_epoch"))
    filled = tagged.select(
        "user_id",
        "ts_epoch",
        "is_grid",
        F.last("value", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_ts, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.first("value", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_ts, ignorenulls=True).over(w_next).alias("next_t"),
    )
    lerp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        (F.col("ts_epoch") - F.col("prev_t"))
        / (F.col("next_t") - F.col("prev_t"))
    )
    return filled.where(F.col("is_grid") == 1).select(
        "user_id",
        F.col("ts_epoch").alias("grid_epoch"),
        F.round("prev_v", 6).alias("last_value"),
        (F.col("ts_epoch") - F.col("prev_t")).alias("staleness_sec"),
        F.round(F.coalesce(lerp, F.col("prev_v")), 6).alias("interp_value"),
    )
