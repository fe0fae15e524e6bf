"""Funnel / retention semantics on hand-built event sequences (oracle
parity is covered by the driver gate)."""

from __future__ import annotations

import datetime as dt

import pytest

from optimal_parallel_fp_growth_spark.operators.funnels import (
    cohort_retention,
    funnel_counts,
)


def _events(spark, rows):
    data = [
        (i, u, t, dt.datetime(2024, 1, d, h, 0, 0))
        for i, (u, t, d, h) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_funnel_order_matters(spark):
    ev = _events(
        spark,
        [
            # u1: full ordered funnel
            (1, "view", 1, 1), (1, "click", 1, 2), (1, "purchase", 1, 3),
            # u2: click BEFORE view, purchase after -> completes view only
            # at step0; click step never strictly after first view
            (2, "click", 1, 1), (2, "view", 1, 2), (2, "purchase", 1, 3),
            # u3: view+click ordered, no purchase
            (3, "view", 1, 1), (3, "click", 1, 2),
            # u4: never views
            (4, "purchase", 1, 1),
        ],
    )
    got = {r.step: r.n_users for r in funnel_counts(ev).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_second_event_rescues_order(spark):
    # click at h1, view at h2, click again at h3: the LATER click
    # completes step 2 (first click strictly after first view)
    ev = _events(
        spark,
        [(1, "click", 1, 1), (1, "view", 1, 2), (1, "click", 1, 3)],
    )
    got = {r.step: r.n_users for r in funnel_counts(ev).collect()}
    assert got == {"view": 1, "click": 1, "purchase": 0}


def test_funnel_validates(spark):
    ev = _events(spark, [(1, "view", 1, 1)])
    with pytest.raises(ValueError, match="2 steps"):
        funnel_counts(ev, ("view",))
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(ev, ("view", "view"))


def test_retention_triangle(spark):
    ev = _events(
        spark,
        [
            (1, "view", 1, 1), (1, "view", 2, 1), (1, "view", 4, 1),
            (2, "view", 2, 1), (2, "view", 3, 1),
            (3, "view", 1, 1),
        ],
    )
    got = {
        (r.cohort_epoch, r.day_offset): r.n_active
        for r in cohort_retention(ev).collect()
    }
    day1 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    day2 = day1 + 86400
    assert got[(day1, 0)] == 2          # u1, u3 first seen day 1
    assert got[(day1, 1)] == 1          # u1 active day 2
    assert got[(day1, 3)] == 1          # u1 active day 4
    assert got[(day2, 0)] == 1          # u2 cohort day 2
    assert got[(day2, 1)] == 1          # u2 active day 3
    assert (day1, 2) not in got         # nobody from cohort 1 on day 3


def test_retention_offset_cap(spark):
    ev = _events(spark, [(1, "view", 1, 1), (1, "view", 20, 1)])
    offsets = {r.day_offset for r in cohort_retention(ev, max_offset_days=14).collect()}
    assert offsets == {0}
