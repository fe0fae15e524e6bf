"""Round-15 GROUND_TRUTH pins for the seven unpinned event-analytics
entries: full-semantics pure-python recomputation over the collected
sf0.001 events table (exact integers; float aggregates via math.fsum
with a 2e-6 post-round tolerance). Same capacity lever as the
relational pin batches — each pin moves an entry to the 4-round cap
and makes it retirement-eligible at 3 green driver rounds."""

from __future__ import annotations

import calendar
import json
import math
from collections import defaultdict

import pytest

from optimal_parallel_fp_growth_spark.queries_events import (
    GAP_MINUTES,
    ROLL_FRAME,
    q_asof_join,
    q_daily_rollup,
    q_events_hopping,
    q_events_retention,
    q_hourly_cube,
    q_json_props_stats,
    q_rolling_stats,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

DAY = 86400
HOP = 21600  # 6 h


def _sec(ts) -> int:
    """Spark's cast(ts AS long): floor to whole epoch seconds (UTC)."""
    return calendar.timegm(ts.utctimetuple())


def _close(a, b, tol=2e-6):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) <= tol


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").collect()


def test_events_rolling_matches_python(spark, events):
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append(r)
    want = {}
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for i, r in enumerate(rows):
            frame = [x.value for x in rows[max(0, i - ROLL_FRAME): i + 1]]
            want[r.event_id] = (
                r.user_id,
                _sec(r.ts),
                round(math.fsum(frame) / len(frame), 6),
                round(max(frame), 6),
                len(frame),
            )
    got = q_rolling_stats(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        w = want[r.event_id]
        assert (r.user_id, r.ts_epoch, r.rolling_n) == (w[0], w[1], w[4])
        assert _close(r.rolling_avg, w[2]) and _close(r.rolling_max, w[3])


def test_events_daily_rollup_matches_python(spark, events):
    cells = defaultdict(list)
    for r in events:
        day = (_sec(r.ts) // DAY) * DAY
        cells[(day, r.event_type)].append(r.value)
    want = {}
    for (day, typ), vals in cells.items():
        want[(day, typ, 0, 0)] = (len(vals), round(math.fsum(vals), 6))
    by_day = defaultdict(list)
    for (day, _), vals in cells.items():
        by_day[day].extend(vals)
    for day, vals in by_day.items():
        want[(day, "(all)", 0, 1)] = (len(vals), round(math.fsum(vals), 6))
    allv = [r.value for r in events]
    want[(-1, "(all)", 1, 1)] = (len(allv), round(math.fsum(allv), 6))
    got = q_daily_rollup(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        w = want[(r.day_epoch, r.event_type, r.g_day, r.g_type)]
        assert r.n_events == w[0] and _close(r.sum_value, w[1])


def test_events_hourly_cube_matches_python(spark, events):
    def hour(ts):
        return (_sec(ts) % DAY) // 3600

    cells = defaultdict(list)
    for r in events:
        cells[(hour(r.ts), r.event_type)].append(r.value)
    want = {}
    agg = lambda vals: (len(vals), round(math.fsum(vals) / len(vals), 6))
    for (h, t), vals in cells.items():
        want[(h, t, 0, 0)] = agg(vals)
    by_h, by_t = defaultdict(list), defaultdict(list)
    for (h, t), vals in cells.items():
        by_h[h].extend(vals)
        by_t[t].extend(vals)
    for h, vals in by_h.items():
        want[(h, "(all)", 0, 1)] = agg(vals)
    for t, vals in by_t.items():
        want[(-1, t, 1, 0)] = agg(vals)
    allv = [r.value for r in events]
    want[(-1, "(all)", 1, 1)] = agg(allv)
    got = q_hourly_cube(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        w = want[(r.hour, r.event_type, r.g_hour, r.g_type)]
        assert r.n_events == w[0] and _close(r.avg_value, w[1])


def test_events_asof_join_matches_python(spark, events):
    # operator ordering: (ts_epoch, is_marker, event_id) with markers
    # at is_marker=0 — a purchase in the same epoch second PRECEDES the
    # non-marker events of that second (inclusive-as-of)
    by_user = defaultdict(list)
    for r in events:
        is_marker = 0 if r.event_type == "purchase" else 1
        by_user[r.user_id].append((_sec(r.ts), is_marker, r.event_id, r))
    want = {}
    for rows in by_user.values():
        rows.sort(key=lambda t: t[:3])
        last = None
        for sec, is_marker, eid, r in rows:
            if is_marker == 0:
                last = sec
            else:
                want[eid] = (
                    r.user_id, r.event_type, sec, last,
                    None if last is None else sec - last,
                )
    got = q_asof_join(spark, SF).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[r.event_id] == (
            r.user_id, r.event_type, r.ts_epoch,
            r.last_marker_ts_epoch, r.sec_since_marker,
        )


def test_events_json_props_matches_python(spark, events):
    per_type = defaultdict(lambda: [0, []])  # n_rows, k values
    for r in events:
        a = per_type[r.event_type]
        a[0] += 1
        try:
            v = json.loads(r.props).get("k")
        except (TypeError, ValueError):
            v = None
        if isinstance(v, int) and not isinstance(v, bool):
            a[1].append(v)
    got = q_json_props_stats(spark, SF).collect()
    assert len(got) == len(per_type)
    for r in got:
        n, ks = per_type[r.event_type]
        assert r.n == n
        assert ks, "fixture must exercise the parsed field"
        assert r.min_k == min(ks) and r.max_k == max(ks)
        assert r.n_even == sum(1 for k in ks if k % 2 == 0)
        assert _close(r.avg_k, round(math.fsum(ks) / len(ks), 6))


def test_events_retention_matches_python(spark, events):
    days = {
        (r.user_id, (_sec(r.ts) // DAY) * DAY) for r in events
    }
    cohort = {}
    for u, d in days:
        if u not in cohort or d < cohort[u]:
            cohort[u] = d
    cell = defaultdict(set)
    for u, d in days:
        off = (d - cohort[u]) // DAY
        if off <= 14:
            cell[(cohort[u], off)].add(u)
    got = q_events_retention(spark, SF).collect()
    assert len(got) == len(cell)
    for r in got:
        assert r.n_active == len(cell[(r.cohort_epoch, r.day_offset)])
    # the triangle really has off-diagonal cells at this SF
    assert any(off > 0 for _, off in cell)


def test_events_hopping_matches_python(spark, events):
    cells = defaultdict(list)
    for r in events:
        base = (_sec(r.ts) // HOP) * HOP
        for o in range(4):
            cells[(base - o * HOP, r.event_type)].append(r.value)
    got = q_events_hopping(spark, SF).collect()
    assert len(got) == len(cells)
    for r in got:
        vals = cells[(r.window_start_epoch, r.event_type)]
        assert r.n_events == len(vals)
        assert _close(r.sum_value, round(math.fsum(vals), 6))
    # every event lands in exactly 4 windows
    assert sum(len(v) for v in cells.values()) == 4 * len(events)
