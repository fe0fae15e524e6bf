"""resample_events: hand-checked grid/ffill/interp values, tiebreak
semantics, and the no-pair-explosion plan shape."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.operators.resample import resample_events


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def _by_grid(out):
    return {
        (r["user_id"], r["grid_epoch"]): (
            r["last_value"],
            r["staleness_sec"],
            r["interp_value"],
        )
        for r in out.collect()
    }


def test_hand_values(spark):
    from datetime import datetime, timezone

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    # user 1: obs at 95→10.0, 205→30.0; grid step 100 → points 100, 200
    rows = [(1, 1, ts(95), 10.0), (2, 1, ts(205), 30.0)]
    out = _by_grid(resample_events(_df(spark, rows), step_sec=100))
    # t=100: ffill 10.0 (staleness 5); lerp 10 + 20*(5/110) = 10.909091
    assert out[(1, 100)] == (10.0, 5, pytest.approx(10.909091))
    # t=200: ffill 10.0 (staleness 105); lerp 10 + 20*(105/110) = 29.090909
    assert out[(1, 200)] == (10.0, 105, pytest.approx(29.090909))


def test_observation_on_grid_point_is_inclusive(spark):
    from datetime import datetime, timezone

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    rows = [(1, 1, ts(100), 5.0), (2, 1, ts(300), 9.0)]
    out = _by_grid(resample_events(_df(spark, rows), step_sec=100))
    assert out[(1, 100)] == (5.0, 0, 5.0)  # at-or-before, factor-0 lerp
    assert out[(1, 200)] == (5.0, 100, 7.0)  # midpoint lerp
    assert out[(1, 300)] == (9.0, 0, 9.0)


def test_same_second_ties_resolve_by_max_event_id(spark):
    from datetime import datetime, timezone

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    rows = [(7, 1, ts(100), 1.0), (9, 1, ts(100), 2.0), (8, 1, ts(100), 3.0),
            (10, 1, ts(200), 4.0)]
    out = _by_grid(resample_events(_df(spark, rows), step_sec=100))
    assert out[(1, 100)][0] == 2.0  # event_id 9 wins, not arrival order


def test_span_shorter_than_step_yields_no_rows(spark):
    from datetime import datetime, timezone

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    rows = [(1, 1, ts(101), 1.0), (2, 1, ts(150), 2.0)]
    assert resample_events(_df(spark, rows), step_sec=100).count() == 0


def test_step_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        resample_events(_df(spark, []), step_sec=0)


def test_plan_no_pair_explosion(spark, sf_small):
    """The grid attach must be the union-tag window, never a range-
    condition join: no nested-loop/cartesian operators in the plan."""
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    out = resample_events(load_table(spark, sf_small, "events"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
