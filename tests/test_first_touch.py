"""First-touch dedup (round 14): the batch kernel recomputed by pure
python on the real sf0.001 events, plus the rollup the registry entry
(`events_first_touch`) gates."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.sessions import first_touch
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_first_touch_matches_brute_force(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", "event_id", "value",
        F.col("ts").cast("long").alias("sec"),
    )
    rows = ev.collect()
    best: dict[tuple, tuple] = {}
    for r in rows:
        k = (r.user_id, r.event_type)
        cand = (r.sec, r.event_id, r.value)
        if k not in best or cand[:2] < best[k][:2]:
            best[k] = cand
    got = first_touch(
        ev.withColumnRenamed("sec", "ts"), ["user_id", "event_type"]
    ).collect()
    assert len(got) == len(best)
    for r in got:
        sec, eid, val = best[(r.user_id, r.event_type)]
        assert (r.ts, r.event_id, r.value) == (sec, eid, val), r
    # the entry's rollup, recomputed from the python survivors
    agg = defaultdict(lambda: [0, 0.0, None, None])
    for (u, t), (sec, eid, val) in best.items():
        a = agg[t]
        a[0] += 1
        a[1] += val
        a[2] = sec if a[2] is None else min(a[2], sec)
        a[3] = sec if a[3] is None else max(a[3], sec)
    from optimal_parallel_fp_growth_spark.queries_events import (
        q_events_first_touch,
    )

    out = {r.event_type: r for r in q_events_first_touch(spark, SF).collect()}
    assert set(out) == set(agg)
    for t, (n, vs, lo, hi) in agg.items():
        r = out[t]
        assert r.n_keys == n and r.earliest_epoch == lo and r.latest_epoch == hi
        assert abs(r.first_value_sum - round(vs, 6)) < 1e-6


def test_first_touch_duplicate_multiplicity_and_ties(spark):
    # equal ts → event_id breaks the tie deterministically
    rows = [
        (1, "a", 10, 100.0, 5),
        (1, "a", 3, 200.0, 5),   # same ts, smaller event_id wins
        (1, "a", 99, 300.0, 4),  # earlier ts wins over both
        (2, "a", 7, 1.0, 9),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, value double, ts long"
    )
    got = {
        (r.user_id, r.event_type): r.event_id
        for r in first_touch(df).collect()
    }
    assert got == {(1, "a"): 99, (2, "a"): 7}
