"""Event-analytics query registry: sessionization, rolling windows,
rollup aggregates (SURVEY §2.8 '(absent)' operator classes, built
Spark-native).

Timestamp parity: Spark's ``cast(ts as long)`` truncates to whole
seconds; the oracles use ``epoch_us(ts) // 1000000`` (floor division —
identical for positive epochs) rather than ``epoch()`` which rounds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.sessions import (
    daily_rollup,
    hourly_cube,
    interval_join_sessions,
    rolling_stats,
    sessionize,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

GAP_MINUTES = 30
ROLL_FRAME = 3


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"), GAP_MINUTES)


def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_stats(load_table(spark, sf_dir, "events"), ROLL_FRAME)


def q_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_rollup(load_table(spark, sf_dir, "events"))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.operators.asof import asof_join_last_event

    return asof_join_last_event(load_table(spark, sf_dir, "events"), "purchase")


def q_hourly_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_cube(load_table(spark, sf_dir, "events"))


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interval_join_sessions(load_table(spark, sf_dir, "events"), GAP_MINUTES)


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column functions (SURVEY §2.6 '(absent)'): parse events.props
    with a schema-d from_json, aggregate the extracted field."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum((F.col("k") % 2 == 0).cast("long")).alias("n_even"),
        )
    )


def q_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h event-time windows — the batch twin of
    streaming.events.windowed_counts (same plan shape, same results;
    the streaming-vs-batch agreement is tested separately)."""
    from optimal_parallel_fp_growth_spark.streaming.events import (
        batch_windowed_counts,
    )

    return batch_windowed_counts(spark, sf_dir, "6 hours")


_EPOCH = "(epoch_us(ts) // 1000000)"

ORACLE_SESSIONIZE = f"""
WITH lagged AS (
  SELECT user_id, event_id, event_type, value, ts, {_EPOCH} AS sec,
         CASE WHEN {_EPOCH} - lag({_EPOCH}) OVER w > {GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tagged AS (
  SELECT *, (sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
  FROM lagged
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_event_types,
       min(sec) AS start_epoch,
       max(sec) AS end_epoch,
       max(sec) - min(sec) AS duration_sec,
       round(sum(value), 6) AS total_value
FROM tagged GROUP BY 1, 2
"""

ORACLE_ROLLING = f"""
SELECT event_id, user_id, {_EPOCH} AS ts_epoch,
       round(avg(value) OVER w, 6) AS rolling_avg,
       round(max(value) OVER w, 6) AS rolling_max,
       count(*) OVER w AS rolling_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLL_FRAME} PRECEDING AND CURRENT ROW)
"""

ORACLE_DAILY_ROLLUP = """
SELECT coalesce(day_epoch, -1) AS day_epoch,
       coalesce(event_type, '(all)') AS event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       grouping(day_epoch)::INT AS g_day,
       grouping(event_type)::INT AS g_type
FROM (SELECT (epoch_us(date_trunc('day', ts)) // 1000000) AS day_epoch,
             event_type, value
      FROM events)
GROUP BY ROLLUP (day_epoch, event_type)
"""

ORACLE_ASOF = f"""
WITH base AS (SELECT event_id, user_id, event_type, {_EPOCH} AS ts_epoch
              FROM events),
l AS (SELECT * FROM base WHERE event_type <> 'purchase'),
r AS (SELECT user_id AS r_user, ts_epoch AS r_ts FROM base
      WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, l.event_type, l.ts_epoch,
       r.r_ts AS last_marker_ts_epoch,
       l.ts_epoch - r.r_ts AS sec_since_marker
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.r_user AND l.ts_epoch >= r.r_ts
"""

# Spark tumbling windows align to the 1970-01-01 UTC epoch origin.
ORACLE_WINDOWED = f"""
SELECT ({_EPOCH} // 21600) * 21600 AS window_start_epoch,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

ORACLE_INTERVAL_JOIN = f"""
WITH sess AS ({ORACLE_SESSIONIZE})
SELECT e.event_id, e.user_id, {_EPOCH.replace('ts', 'e.ts')} AS ts_epoch,
       s.session_idx
FROM events e JOIN sess s
  ON e.user_id = s.user_id
 AND {_EPOCH.replace('ts', 'e.ts')} BETWEEN s.start_epoch AND s.end_epoch
"""

FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.operators.funnels import funnel_counts

    return funnel_counts(load_table(spark, sf_dir, "events"), FUNNEL_STEPS)


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.operators.funnels import cohort_retention

    return cohort_retention(load_table(spark, sf_dir, "events"), max_offset_days=14)


ORACLE_FUNNEL = f"""
WITH e AS (SELECT user_id, event_type, {_EPOCH} AS sec FROM events),
per_user AS (
  SELECT user_id,
         list(sec ORDER BY sec) FILTER (event_type = '{FUNNEL_STEPS[0]}') AS l0,
         list(sec ORDER BY sec) FILTER (event_type = '{FUNNEL_STEPS[1]}') AS l1,
         list(sec ORDER BY sec) FILTER (event_type = '{FUNNEL_STEPS[2]}') AS l2
  FROM e GROUP BY user_id
),
walk AS (
  SELECT user_id,
         l0[1] AS t0,
         list_filter(l1, x -> x > l0[1])[1] AS t1,
         list_filter(l2, x -> x > list_filter(l1, y -> y > l0[1])[1])[1] AS t2
  FROM per_user
)
SELECT 0 AS step_idx, '{FUNNEL_STEPS[0]}' AS step, count(t0)::BIGINT AS n_users FROM walk
UNION ALL
SELECT 1, '{FUNNEL_STEPS[1]}', count(t1)::BIGINT FROM walk
UNION ALL
SELECT 2, '{FUNNEL_STEPS[2]}', count(t2)::BIGINT FROM walk
"""

ORACLE_RETENTION = f"""
WITH days AS (SELECT DISTINCT user_id,
                     ({_EPOCH} // 86400) * 86400 AS day_epoch
              FROM events),
cohort AS (SELECT user_id, min(day_epoch) AS cohort_epoch FROM days GROUP BY 1)
SELECT cohort_epoch,
       ((day_epoch - cohort_epoch) // 86400)::BIGINT AS day_offset,
       count(DISTINCT d.user_id)::BIGINT AS n_active
FROM days d JOIN cohort c ON d.user_id = c.user_id
WHERE (day_epoch - cohort_epoch) // 86400 <= 14
GROUP BY 1, 2
"""

TOP_USERS_K = 5


def q_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type heavy hitters: the TOP_USERS_K most active users of each
    event type. Two shuffles (count agg with map-side combine, then the
    rank window), and the rank filter rides the two-phase
    WindowGroupLimit rewrite so no task ever materializes a full
    event_type's user list — the skew-safe top-k shape at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("user_id")
    )
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_USERS_K)
    )


ORACLE_TOP_USERS = f"""
WITH c AS (SELECT event_type, user_id, COUNT(*) AS cnt FROM events GROUP BY 1, 2),
r AS (SELECT event_type, user_id, cnt,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, user_id) AS rank
      FROM c)
SELECT event_type, user_id, cnt, rank::INT AS rank FROM r
WHERE rank <= {TOP_USERS_K}
"""

def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill + linear interpolation
    (operators/resample.py) — one user_id shuffle, union-tag windows,
    no range join."""
    from optimal_parallel_fp_growth_spark.operators.resample import (
        RESAMPLE_STEP_SEC,
        resample_events,
    )

    return resample_events(
        load_table(spark, sf_dir, "events"), step_sec=RESAMPLE_STEP_SEC
    )


# Mirrors resample_events stage-for-stage: per-(user, ts) arg_max
# reduction, integer grid alignment, union-tag IGNORE NULLS windows.
def _oracle_resample(step: int) -> str:
    return f"""
WITH per_ts AS (
  SELECT user_id, {_EPOCH} AS ts_epoch, arg_max(value, event_id) AS value
  FROM events GROUP BY 1, 2),
bounds AS (SELECT user_id, min(ts_epoch) AS mn, max(ts_epoch) AS mx
           FROM per_ts GROUP BY 1),
grid AS (
  SELECT user_id,
         unnest(generate_series(((mn + {step} - 1) // {step}) * {step},
                                (mx // {step}) * {step}, {step})) AS ts_epoch
  FROM bounds
  WHERE ((mn + {step} - 1) // {step}) * {step} <= (mx // {step}) * {step}),
tagged AS (
  SELECT user_id, ts_epoch, value, 0 AS is_grid FROM per_ts
  UNION ALL
  SELECT user_id, ts_epoch, NULL, 1 FROM grid),
win AS (
  SELECT user_id, ts_epoch, is_grid,
         last_value(value IGNORE NULLS) OVER w_prev AS prev_v,
         last_value(CASE WHEN is_grid = 0 THEN ts_epoch END IGNORE NULLS)
             OVER w_prev AS prev_t,
         first_value(value IGNORE NULLS) OVER w_next AS next_v,
         first_value(CASE WHEN is_grid = 0 THEN ts_epoch END IGNORE NULLS)
             OVER w_next AS next_t
  FROM tagged
  WINDOW
    w_prev AS (PARTITION BY user_id ORDER BY ts_epoch, is_grid
               ROWS UNBOUNDED PRECEDING),
    w_next AS (PARTITION BY user_id ORDER BY ts_epoch, is_grid
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, ts_epoch AS grid_epoch,
       round(prev_v, 6) AS last_value,
       ts_epoch - prev_t AS staleness_sec,
       round(coalesce(
           prev_v + (next_v - prev_v) * (ts_epoch - prev_t)
                    / (next_t - prev_t),
           prev_v), 6) AS interp_value
FROM win WHERE is_grid = 1
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user matrix: event_type pivoted into columns as an
    explicit conditional aggregate — ONE shuffle on user_id with
    map-side combine. Deliberately NOT ``DataFrame.pivot``: even with
    the value list pinned, pivot plans a (user, type) pre-aggregate
    plus a second pivotfirst shuffle (two exchanges, verified in
    tests/test_plan_quality.py); the conditional agg halves that.
    Result equivalence with ``.pivot`` is pinned in
    tests/test_pivot.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.round(
                F.sum(F.when(F.col("event_type") == t, F.col("value"))), 6
            ).alias(t)
            for t in EVENT_TYPES
        ]
    )


def q_events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the pivoted matrix back to long form (unpivot/stack
    coverage); absent combinations drop with their nulls, so
    pivot→unpivot is exactly the per-(user, type) aggregate."""
    wide = q_events_pivot(spark, sf_dir)
    return wide.unpivot(
        "user_id", list(EVENT_TYPES), "event_type", "sum_value"
    ).where(F.col("sum_value").isNotNull())


_PIVOT_COLS = ",\n       ".join(
    f"round(sum(value) FILTER (event_type = '{t}'), 6) AS {t}"
    for t in EVENT_TYPES
)

ORACLE_EVENTS_PIVOT = f"""
SELECT user_id,
       {_PIVOT_COLS}
FROM events GROUP BY user_id
"""

ORACLE_EVENTS_UNPIVOT = f"""
WITH pvt AS ({ORACLE_EVENTS_PIVOT})
SELECT user_id, event_type, sum_value FROM (
  {" UNION ALL ".join(
      f"SELECT user_id, '{t}' AS event_type, {t} AS sum_value FROM pvt"
      for t in EVENT_TYPES
  )})
WHERE sum_value IS NOT NULL
"""

def q_events_user_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family window coverage (ntile / percent_rank / cume_dist):
    spend quartiles of users WITHIN each event type. The window
    partitions on event_type — a bounded-cardinality dimension — so no
    global single-reducer sort ever happens; the per-user totals
    beneath it are one map-side-combined shuffle. Totals are summed on
    DECIMAL (order-independent), ranks use a (total desc, user_id)
    total order so every rank function is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return totals.select(
        "event_type",
        "user_id",
        "total_value",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


ORACLE_USER_QUARTILES = """
WITH t AS (SELECT event_type, user_id,
                  round(sum(value::DECIMAL(18,6)), 6)::DOUBLE AS total_value
           FROM events GROUP BY 1, 2)
SELECT event_type, user_id, total_value,
       (ntile(4) OVER w)::INT AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY total_value DESC, user_id ASC)
"""

def q_bloom_user_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering as a bloom-pruned ANTI join: drop every
    event of users who ever logged an error with value > 200, then
    aggregate survivors per type. The event stream is prefiltered by a
    broadcast Bloom bitmap over the blocked user ids; only
    bloom-suspect rows reach the exact anti join, and false positives
    are removed there — output exact for any fpp."""
    from optimal_parallel_fp_growth_spark.operators.bloom import bloom_anti_join

    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    blocked = ev.where(
        (F.col("event_type") == "error") & (F.col("value") > 200)
    ).select("user_id")
    kept = bloom_anti_join(ev, blocked, "user_id", fpp=0.01)
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


ORACLE_BLOOM_USER_FILTER = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 6) AS sum_value
FROM events
WHERE user_id NOT IN (SELECT user_id FROM events
                      WHERE event_type = 'error' AND value > 200)
GROUP BY 1
"""


def q_events_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user stats from a mergeable sketch table: fold events
    into per-(event_type, day) HLL sketches, then roll the dailies up
    to per-type totals WITHOUT rescanning rows — the incremental
    corpus-stats pattern (daily sketch rows persist; any coarser
    rollup is a union of bytes). At the driver's sf0.01 the user
    cardinality (150) is under the Datasketches coupon threshold, so
    the sketch is in exact mode and the oracle pins the TRUE distinct
    count; the estimating regime is envelope-tested in
    tests/test_sketches.py."""
    from optimal_parallel_fp_growth_spark.operators.sketches import (
        sketch_distinct,
        sketch_rollup,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    dailies = sketch_distinct(ev, ["event_type", "day"], "user_id")
    return sketch_rollup(dailies, ["event_type"]).select(
        "event_type",
        F.col("est_distinct").alias("est_users"),
        "n_rows",
        F.col("n_sketches").alias("n_days"),
    )


ORACLE_EVENTS_DISTINCT_SKETCH = """
SELECT event_type,
       count(DISTINCT user_id) AS est_users,
       count(*) AS n_rows,
       count(DISTINCT CAST(ts AS DATE)) AS n_days
FROM events
GROUP BY 1
"""


def q_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) window aggregate: 1-day windows every 6 hours
    — each event lands in 4 overlapping windows (Spark's
    ``window(ts, "1 day", "6 hours")``; the tumbling twin is
    `events_windowed_counts`). The oracle reconstructs window
    membership with an explicit 4-offset expansion, pinning Spark's
    epoch-aligned window-start semantics."""
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day", "6 hours").alias("w"), "event_type"
        )
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


# Spark's hopping windows start on slide boundaries aligned to the
# epoch; an event at t belongs to windows with start in
# (t - 1 day, t] ∩ {epoch-aligned 6h marks} — exactly the 4 starts
# floor_6h(t) - {0, 6, 12, 18} hours.
ORACLE_EVENTS_HOPPING = """
WITH x AS (
  SELECT event_type, value,
         to_timestamp((epoch(ts)::BIGINT // 21600) * 21600
                      - off.o * 21600) AS wstart
  FROM events, (SELECT unnest(range(4)) AS o) off),
f AS (SELECT epoch(wstart)::BIGINT AS window_start_epoch, event_type,
             count(*) AS n_events, round(sum(value), 6) AS sum_value
      FROM x GROUP BY 1, 2)
SELECT * FROM f
"""


def q_events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch dedup per (user_id, event_type) — the deterministic
    batch twin of streaming.events.stream_dedup (round 14; the
    streaming path's cross-micro-batch state behavior and key-set
    agreement are pinned in test_streaming.py). Keeps each key's first
    event by (ts, event_id) via ONE window over the key partitioning —
    a single hash shuffle, no join — then rolls the survivors up per
    event_type. The oracle restates the window with row_number()."""
    from optimal_parallel_fp_growth_spark.operators.sessions import (
        first_touch,
    )

    ev = load_table(spark, sf_dir, "events")
    ft = first_touch(ev, ["user_id", "event_type"])
    return ft.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.sum("value"), 6).alias("first_value_sum"),
        F.min(F.col("ts").cast("long")).alias("earliest_epoch"),
        F.max(F.col("ts").cast("long")).alias("latest_epoch"),
    )


ORACLE_EVENTS_FIRST_TOUCH = f"""
WITH ranked AS (
  SELECT event_type, value, {_EPOCH} AS sec,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_type, count(*) AS n_keys,
       round(sum(value), 6) AS first_value_sum,
       min(sec) AS earliest_epoch, max(sec) AS latest_epoch
FROM ranked WHERE rn = 1 GROUP BY 1
"""


def q_events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch under the oracle gate (round 14):
    per-event_type value quantiles via ``percentile_approx`` — Spark's
    Greenwald-Khanna aggregate, computed as BOUNDED-MEMORY partial
    sketches per partition and merged, never a per-group sort. At 100
    TB that is the only shape that works: the exact spelling sorts
    every group; the sketch ships O(accuracy · log n) summaries
    through the shuffle. At the driver's scale the chosen accuracy
    (1e6) exceeds every group size, so GK is in its EXACT regime and
    the gate pins true discrete quantiles — the estimating regime's
    rank-error envelope is tested in pytest. Fails closed in-query
    unless the sketch path equals Spark's own exact sort-based
    ``percentile_disc`` on every group."""
    ev = load_table(spark, sf_dir, "events")
    qs = [0.5, 0.9, 0.99]
    sk = ev.groupBy("event_type").agg(
        F.percentile_approx("value", qs, 1000000).alias("p"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    exact = ev.groupBy("event_type").agg(
        F.expr(
            "array(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), "
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY value), "
            "percentile_disc(0.99) WITHIN GROUP (ORDER BY value))"
        ).alias("pe")
    )
    bad = (
        sk.join(exact, "event_type")
        .where(F.col("p") != F.col("pe"))
        .count()
    )
    if bad:
        raise AssertionError(
            f"quantile sketch diverged from the exact path on {bad} "
            "groups at exact-regime accuracy"
        )
    return sk.select(
        "event_type",
        F.col("p")[0].alias("p50"),
        F.col("p")[1].alias("p90"),
        F.col("p")[2].alias("p99"),
        "n_rows",
    )


ORACLE_EVENTS_QUANTILE_SKETCH = """
SELECT event_type,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90,
       quantile_disc(value, 0.99) AS p99,
       count(*) AS n_rows
FROM events
GROUP BY 1
"""


def q_dq_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream data-quality gate: one aggregation job over one
    scan, long verdict table (check, observed, passed)."""
    from optimal_parallel_fp_growth_spark.operators.quality_checks import (
        events_quality_suite,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    return events_quality_suite(load_table(spark, sf_dir, "events"))


# Mirrors events_quality_suite constraint-for-constraint (lock-step).
ORACLE_DQ_EVENTS = """
WITH m AS (
  SELECT round(count(DISTINCT event_id)::DOUBLE / count(event_id), 9) AS event_id_unique,
         round(avg((ts IS NOT NULL)::INT), 9)                         AS ts_complete,
         round(avg((user_id IS NOT NULL)::INT), 9)                    AS user_complete,
         round(avg((event_type IN ('click','error','purchase','signup','view'))::INT), 9)
                                                                      AS type_accepted,
         round(avg((value > 0)::INT), 9)                              AS value_positive,
         round(avg((year(ts) BETWEEN 2020 AND 2030)::INT), 9)         AS ts_in_window
  FROM events)
SELECT u.check, u.observed, u.observed = 1.0 AS passed
FROM (
  SELECT 'event_id_unique' AS check, event_id_unique AS observed FROM m
  UNION ALL SELECT 'ts_complete', ts_complete FROM m
  UNION ALL SELECT 'user_complete', user_complete FROM m
  UNION ALL SELECT 'type_accepted', type_accepted FROM m
  UNION ALL SELECT 'value_positive', value_positive FROM m
  UNION ALL SELECT 'ts_in_window', ts_in_window FROM m) u
"""


def q_hive_layout_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hive-partitioned layout lifecycle under the oracle gate
    (round 11; sources/sinks.py::write_parquet(partition_by=...)):
    events written partitionBy(day) — 30 date directories — read back
    through partition-column inference, filtered on a LITERAL day
    range so the filter resolves to PartitionFilters at PLAN time
    (5 of 30 directories listed, the others never opened; pruning
    itself is plan-asserted in tests/test_sources_sinks.py), then a
    per-type rollup. The layout must be LOSSLESS and the partition
    round trip type-exact: a row landing in the wrong day directory,
    a dropped row, or a date mis-parse on read-back breaks equality
    with the oracle's direct timestamp-range filter over the unsorted
    table. Session-temp dir, dropped after materializing."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources.sinks import (
        read_back,
        write_parquet,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    with session_temp_layout(spark, "hive") as (tdir, materialize):
        path = os.path.join(tdir, "events_by_day")
        write_parquet(ev, path, partition_by=("day",))
        back = read_back(spark, path).where(
            (F.col("day") >= F.lit("2024-01-05").cast("date"))
            & (F.col("day") <= F.lit("2024-01-09").cast("date"))
        )
        out = (
            back.groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")), 4
                )
                .cast("double")
                .alias("value_sum"),
            )
            .orderBy("event_type")
        )
        return materialize(out)


ORACLE_HIVE_LAYOUT = """
SELECT event_type, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value::DECIMAL(18,6)), 4)::DOUBLE AS value_sum
FROM events
WHERE ts::DATE BETWEEN DATE '2024-01-05' AND DATE '2024-01-09'
GROUP BY 1 ORDER BY 1
"""


EVENT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bloom_user_filter": q_bloom_user_filter,
    "events_distinct_sketch": q_events_distinct_sketch,
    "dq_events": q_dq_events,
    "events_hopping": q_events_hopping,
    "events_pivot": q_events_pivot,
    "events_unpivot": q_events_unpivot,
    "events_user_quartiles": q_events_user_quartiles,
    "events_sessionize": q_sessionize,
    "events_rolling": q_rolling_stats,
    "events_daily_rollup": q_daily_rollup,
    "events_asof_join": q_asof_join,
    "events_windowed_counts": q_windowed_counts,
    "events_first_touch": q_events_first_touch,
    "events_quantile_sketch": q_events_quantile_sketch,
    "events_interval_join": q_interval_join,
    "events_hourly_cube": q_hourly_cube,
    "events_json_props": q_json_props_stats,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_top_users": q_events_top_users,
    "events_resample": q_events_resample,
    "hive_layout_read": q_hive_layout_read,
}

ORACLE_JSON_PROPS = """
SELECT event_type,
       count(*) AS n,
       round(avg(k), 6) AS avg_k,
       min(k) AS min_k,
       max(k) AS max_k,
       sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_even
FROM (SELECT event_type, json_extract_string(props, '$.k')::INT AS k FROM events)
GROUP BY 1
"""

ORACLE_HOURLY_CUBE = """
SELECT coalesce(hour, -1) AS hour,
       coalesce(event_type, '(all)') AS event_type,
       count(*) AS n_events,
       round(avg(value), 6) AS avg_value,
       grouping(hour)::INT AS g_hour,
       grouping(event_type)::INT AS g_type
FROM (SELECT extract(hour FROM ts)::INT AS hour, event_type, value FROM events)
GROUP BY CUBE (hour, event_type)
"""

EVENT_ORACLES: dict[str, str] = {
    "bloom_user_filter": ORACLE_BLOOM_USER_FILTER,
    "events_distinct_sketch": ORACLE_EVENTS_DISTINCT_SKETCH,
    "dq_events": ORACLE_DQ_EVENTS,
    "events_hopping": ORACLE_EVENTS_HOPPING,
    "events_pivot": ORACLE_EVENTS_PIVOT,
    "events_unpivot": ORACLE_EVENTS_UNPIVOT,
    "events_user_quartiles": ORACLE_USER_QUARTILES,
    "events_interval_join": ORACLE_INTERVAL_JOIN,
    "events_hourly_cube": ORACLE_HOURLY_CUBE,
    "events_json_props": ORACLE_JSON_PROPS,
    "events_sessionize": ORACLE_SESSIONIZE,
    "events_rolling": ORACLE_ROLLING,
    "events_daily_rollup": ORACLE_DAILY_ROLLUP,
    "events_asof_join": ORACLE_ASOF,
    "hive_layout_read": ORACLE_HIVE_LAYOUT,
    "events_windowed_counts": ORACLE_WINDOWED,
    "events_first_touch": ORACLE_EVENTS_FIRST_TOUCH,
    "events_quantile_sketch": ORACLE_EVENTS_QUANTILE_SKETCH,
    "events_funnel": ORACLE_FUNNEL,
    "events_retention": ORACLE_RETENTION,
    "events_top_users": ORACLE_TOP_USERS,
}

from optimal_parallel_fp_growth_spark.operators.resample import (  # noqa: E402
    RESAMPLE_STEP_SEC as _RESAMPLE_STEP,
)

EVENT_ORACLES["events_resample"] = _oracle_resample(_RESAMPLE_STEP)
