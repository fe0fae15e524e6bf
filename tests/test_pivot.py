"""Pivot/unpivot queries (queries_events.py): the one-shuffle
conditional aggregate must agree with DataFrame.pivot, and
pivot→unpivot must round-trip to the long-form aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.queries_events import (
    EVENT_TYPES,
    q_events_pivot,
    q_events_unpivot,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_conditional_agg_equals_dataframe_pivot(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    via_pivot = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.round(F.sum("value"), 6))
    )
    ours = q_events_pivot(spark, sf_small)
    assert ours.columns == via_pivot.columns
    assert _rows(ours) == _rows(via_pivot)


def test_pivot_unpivot_roundtrip(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    long_form = (
        ev.groupBy("user_id", "event_type")
        .agg(F.round(F.sum("value"), 6).alias("sum_value"))
    )
    assert _rows(q_events_unpivot(spark, sf_small)) == _rows(long_form)


def test_pivot_null_means_no_events_of_type(spark, sf_small):
    wide = q_events_pivot(spark, sf_small)
    ev = load_table(spark, sf_small, "events")
    # pick a (user, type) combination that does not occur, if any
    present = {
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    users = {u for u, _ in present}
    missing = [
        (u, t) for u in users for t in EVENT_TYPES if (u, t) not in present
    ]
    rows = {r.user_id: r for r in wide.collect()}
    assert len(rows) == len(users)
    for u, t in missing[:20]:
        assert rows[u][t] is None
