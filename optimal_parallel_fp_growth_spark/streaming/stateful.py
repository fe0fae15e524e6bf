"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the extension hook for operators Structured Streaming lacks natively
(SURVEY §2.8; driver north star "custom stateful operators").

``first_seen_dedup``: streaming exact-dedup — emit each key's FIRST
event (by ts, event_id) and drop every later occurrence, across
micro-batches. State per key is a single seen-flag + the winning row,
sharded by the grouping key across executors: at 100 TB the state store
(RocksDB in prod config) holds |distinct keys| entries, never raw
events, and the shuffle is the one groupBy exchange.

Semantics note: within one micro-batch the winner is chosen by
(ts, event_id) min, so replaying the same data in different batch
splits yields the same survivors as long as arrival order respects
event time per key (guaranteed here by the single-file availableNow
drive; in production the same guarantee comes from watermarked
reordering upstream or is accepted as first-arrival-wins). For feeds
whose cross-batch order is NOT guaranteed, `first_seen_dedup_watermarked`
/ `funnel_progress_watermarked` buffer per-key state until the
watermark and are exact under any disorder bounded by the watermark
delay.

Compatibility (round 4): `heavy_hitters_stream` changed its state
schema (added `decrements`) and output schema (added `max_count`).
A streaming query restarted from a pre-round-4 checkpoint will fail
state-schema validation — start a fresh checkpoint directory — and
downstream consumers must accept the extra `max_count` column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_type string, first_ts_epoch long, "
    "first_event_id long, value double"
)
STATE_SCHEMA = "seen int"

_DURATION_UNIT_MS = {
    "second": 1_000,
    "seconds": 1_000,
    "minute": 60_000,
    "minutes": 60_000,
    "hour": 3_600_000,
    "hours": 3_600_000,
    "day": 86_400_000,
    "days": 86_400_000,
}


def _duration_ms(s: str) -> int:
    """Parse a '<n> <unit>' Spark-style duration (PySpark's
    GroupState.setTimeoutTimestamp takes a bare epoch-ms, unlike the
    Scala overload that accepts an additionalDuration string)."""
    try:
        n, unit = s.strip().split()
        return int(n) * _DURATION_UNIT_MS[unit.lower()]
    except (ValueError, KeyError):
        raise ValueError(
            f"bad duration {s!r}; expected '<n> <seconds|minutes|hours|days>'"
        ) from None


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # Key already emitted in an earlier batch: drain & drop.
        for _ in pdfs:
            pass
        return
    best = None  # (ts_epoch, event_id, value)
    for pdf in pdfs:
        for ts_epoch, event_id, value in zip(
            pdf["ts_epoch"], pdf["event_id"], pdf["value"]
        ):
            cand = (int(ts_epoch), int(event_id), float(value))
            if best is None or cand[:2] < best[:2]:
                best = cand
    if best is None:
        return
    state.update((1,))
    yield pd.DataFrame(
        [(key[0], key[1], best[0], best[1], best[2])],
        columns=["user_id", "event_type", "first_ts_epoch", "first_event_id", "value"],
    )


def first_seen_dedup(
    events: DataFrame, ttl: str | None = None, watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming first-occurrence dedup per (user_id, event_type).
    Input must be a streaming DataFrame with ts/event_id/value.

    ``ttl=None`` keeps every key's seen-flag forever — exact dedup, at
    the price of state growing with |distinct keys|. At 100 TB the
    keyspace is unbounded, so ``ttl="7 days"``-style expiry (event-time
    timeout against the watermark: a key's flag drops once the
    watermark passes its last event + ttl) bounds the state store to
    the keys active inside one ttl window — the standard
    exactness-for-boundedness trade: a key recurring AFTER the ttl gap
    re-emits as a fresh first-seen. The ``watermark`` delay (how much
    event-time lateness the stream tolerates before state may expire)
    is applied here when ttl is set; production callers pass their own
    lateness budget."""
    if ttl is not None:
        events = events.withWatermark("ts", watermark)
    prepared = events.selectExpr(
        "user_id", "event_type", "ts", "cast(ts as long) AS ts_epoch",
        "event_id", "value"
    )
    if ttl is None:
        return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
            _first_seen_fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )

    ttl_ms = _duration_ms(ttl)

    def fn_ttl(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # watermark passed last activity + ttl: drop the seen-flag
            state.remove()
            return
        emitted = state.exists
        best = None
        last_ms = 0
        for pdf in pdfs:
            for ts_epoch, event_id, value in zip(
                pdf["ts_epoch"], pdf["event_id"], pdf["value"]
            ):
                cand = (int(ts_epoch), int(event_id), float(value))
                last_ms = max(last_ms, cand[0] * 1000)
                if best is None or cand[:2] < best[:2]:
                    best = cand
        if best is None:
            return
        state.update((1,))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
        if not emitted:
            yield pd.DataFrame(
                [(key[0], key[1], best[0], best[1], best[2])],
                columns=[
                    "user_id",
                    "event_type",
                    "first_ts_epoch",
                    "first_event_id",
                    "value",
                ],
            )

    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        fn_ttl,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def first_seen_dedup_watermarked(
    events: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """Watermark-delayed first-seen dedup: exact under ANY cross-batch
    arrival order whose event-time disorder is bounded by ``delay`` —
    the variant `first_seen_dedup` documents as the production guard
    for disordered feeds.

    Instead of committing the first arrival, each key BUFFERS its
    current best (min (ts, event_id)) candidate in state and emits only
    once the watermark passes the candidate's event time — at that
    point no earlier event can still arrive (later ones are late and
    dropped by the watermark), so the emission equals the batch
    ``min(struct(ts, event_id, value))`` regardless of how events were
    split or shuffled across micro-batches. Flushing with no new data
    rides the event-time timeout: the no-data micro-batch Spark runs
    after a watermark advance fires `hasTimedOut` for every key whose
    candidate just became final.

    State per key is one row (flag + candidate) — same bound as the
    exact path. Emission latency is the price: nothing is emitted until
    the watermark (driven by max observed event time minus ``delay``)
    passes the candidate. A stream that simply stops may leave its last
    ``delay`` of candidates unflushed — standard watermark semantics.
    """
    prepared = (
        events.withWatermark("ts", delay)
        .selectExpr(
            "user_id", "event_type", "ts", "cast(ts as long) AS ts_epoch",
            "event_id", "value",
        )
    )
    state_schema = "emitted int, pend_ts long, pend_eid long, pend_val double"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            emitted, p_ts, p_eid, p_val = state.get
            pend = None if emitted else (int(p_ts), int(p_eid), float(p_val))
            emitted = bool(emitted)
        else:
            emitted, pend = False, None
        if not state.hasTimedOut:
            for pdf in pdfs:
                if emitted:
                    continue  # drain: key already final
                for ts_epoch, event_id, value in zip(
                    pdf["ts_epoch"], pdf["event_id"], pdf["value"]
                ):
                    cand = (int(ts_epoch), int(event_id), float(value))
                    if pend is None or cand[:2] < pend[:2]:
                        pend = cand
        if emitted or pend is None:
            return
        wm_ms = state.getCurrentWatermarkMs()
        final_ms = pend[0] * 1000
        if wm_ms > final_ms:
            # no event with ts < watermark can still arrive: final.
            state.update((1, pend[0], pend[1], pend[2]))
            yield pd.DataFrame(
                [(key[0], key[1], pend[0], pend[1], pend[2])],
                columns=[
                    "user_id",
                    "event_type",
                    "first_ts_epoch",
                    "first_event_id",
                    "value",
                ],
            )
        else:
            state.update((0, pend[0], pend[1], pend[2]))
            # fires on the first micro-batch whose watermark passes the
            # candidate (must be set strictly above the current wm)
            state.setTimeoutTimestamp(max(final_ms, wm_ms) + 1)

    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        state_schema,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def funnel_progress(events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Streaming ordered-funnel state machine per user: track the
    completion time of each step (step i completes at the first step-i
    event STRICTLY LATER than step i-1's completion), carrying progress
    across micro-batches. Emits a row whenever a user advances:
    (user_id, steps_completed, last_step, last_t_epoch).

    Exactness contract: identical to the batch walk
    (operators/funnels.py::funnel_counts) when each key's events arrive
    in event-time order across batches — the same guarantee
    first_seen_dedup documents. Under that order, each t_i is final the
    moment it is set (later batches only contain later timestamps), so
    the incremental machine never needs revision. State per user is
    len(steps) longs — the state store holds |users|·k longs at any
    corpus size, never raw events. For disordered feeds use
    `funnel_progress_watermarked`, which buys order-independence with a
    watermark-bounded buffer.
    """
    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError("steps must be >= 2 distinct event types")
    k = len(steps)
    out_schema = (
        "user_id long, steps_completed int, last_step string, last_t_epoch long"
    )
    state_schema = ", ".join(f"t{i} long" for i in range(k))
    step_idx = {s: i for i, s in enumerate(steps)}

    def fn(key, pdfs, state: GroupState):
        ts = list(state.get) if state.exists else [-1] * k
        done_before = sum(1 for t in ts if t >= 0)
        # rows WITHIN a micro-batch arrive unsorted: gather the batch's
        # events and walk them in event-time order, so each step gets
        # its EARLIEST qualifying time (exactly the batch walk). Per
        # user per batch this is that user's events, which is the same
        # bound sessionization already tolerates.
        batch = []
        for pdf in pdfs:
            batch.extend(
                (int(sec), step_idx[et])
                for et, sec in zip(pdf["event_type"], pdf["ts_epoch"])
                if et in step_idx
            )
        batch.sort()
        for sec, i in batch:
            if ts[i] >= 0:
                continue
            if i == 0 or (ts[i - 1] >= 0 and sec > ts[i - 1]):
                ts[i] = sec
        done_now = sum(1 for t in ts if t >= 0)
        if done_now > done_before:
            state.update(tuple(ts))
            last = done_now - 1
            yield pd.DataFrame(
                [(key[0], done_now, steps[last], ts[last])],
                columns=[
                    "user_id",
                    "steps_completed",
                    "last_step",
                    "last_t_epoch",
                ],
            )

    prepared = events.selectExpr(
        "user_id", "event_type", "cast(ts as long) AS ts_epoch"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def funnel_progress_watermarked(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermark-delayed ordered funnel: `funnel_progress` semantics
    made exact under ANY cross-batch arrival order whose event-time
    disorder is bounded by ``delay``.

    Each user's step events are BUFFERED in state until the watermark
    passes them; only then are they applied to the step machine, in
    event-time order, so the incremental walk replays the batch walk
    (operators/funnels.py::funnel_counts) event-for-event no matter how
    the feed was split or shuffled across micro-batches. Events at or
    above the watermark stay buffered (an equal-timestamp event may
    still arrive and would sort ahead by step index); an event-time
    timeout at the earliest buffered timestamp re-invokes the key when
    the watermark advances with no new data.

    State per user is k completion longs + the buffered events inside
    one ``delay`` window — bounded by delay x per-user event rate, the
    standard cost of watermarked exactness (vs. k longs for the
    order-assuming variant). Emissions carry the same schema and the
    same monotone no-retraction contract as `funnel_progress`.
    """
    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError("steps must be >= 2 distinct event types")
    k = len(steps)
    out_schema = (
        "user_id long, steps_completed int, last_step string, last_t_epoch long"
    )
    state_schema = (
        ", ".join(f"t{i} long" for i in range(k))
        + ", buf_ts array<long>, buf_step array<int>"
    )
    step_idx = {s: i for i, s in enumerate(steps)}

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            *ts_raw, buf_ts, buf_step = state.get
            ts = [int(t) for t in ts_raw]
            buf = sorted(zip((int(x) for x in buf_ts), (int(x) for x in buf_step)))
        else:
            ts, buf = [-1] * k, []
        done_before = sum(1 for t in ts if t >= 0)
        fresh = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                fresh.extend(
                    (int(sec), step_idx[et])
                    for et, sec in zip(pdf["event_type"], pdf["ts_epoch"])
                    if et in step_idx
                )
            if fresh:
                buf = sorted(buf + fresh)
        wm_ms = state.getCurrentWatermarkMs()
        # finalize the prefix strictly below the watermark: nothing that
        # sorts before (or ties) it can still arrive
        n_final = 0
        for sec, i in buf:
            if sec * 1000 >= wm_ms:
                break
            n_final += 1
            if ts[i] >= 0:
                continue
            if i == 0 or (ts[i - 1] >= 0 and sec > ts[i - 1]):
                ts[i] = sec
        buf = buf[n_final:]
        done_now = sum(1 for t in ts if t >= 0)
        if fresh or n_final or not state.exists:
            state.update(
                (*ts, [s for s, _ in buf], [i for _, i in buf])
            )
        if buf:
            state.setTimeoutTimestamp(max(buf[0][0] * 1000, wm_ms) + 1)
        if done_now > done_before:
            last = done_now - 1
            yield pd.DataFrame(
                [(key[0], done_now, steps[last], ts[last])],
                columns=[
                    "user_id",
                    "steps_completed",
                    "last_step",
                    "last_t_epoch",
                ],
            )

    prepared = (
        events.withWatermark("ts", delay)
        .selectExpr("user_id", "event_type", "ts", "cast(ts as long) AS ts_epoch")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def heavy_hitters_stream(events: DataFrame, capacity: int = 8) -> DataFrame:
    """Streaming Misra-Gries heavy hitters per event_type: maintain at
    most ``capacity`` candidate users per type with bounded state, and
    after every micro-batch emit the current candidates as
    (event_type, user_id, est_count, max_count). Classic guarantee: any
    user whose true count exceeds N/(capacity+1) is guaranteed present,
    and ``est_count`` undercounts the true count by at most the number
    of decrement steps taken so far — which this operator TRACKS in
    state and surfaces, so every emitted row carries its own certainty
    interval:

        est_count ≤ true_count ≤ max_count  (= est_count + decrements)

    The tracked bound is per-run exact, always ≤ the a-priori
    N/(capacity+1) worst case. With capacity ≥ distinct users no
    decrement ever fires, the interval collapses (est = max) and the
    counts are EXACT — the batch-agreement test pins that case.

    This is the operator streaming SQL cannot express: a native
    ``groupBy(type, user).count`` keeps state per (type, user) — 
    unbounded in users — while this keeps ``capacity`` counters per
    type, a constant, making 100 TB state-store size a configuration
    choice instead of a data-size liability.

    Determinism: batch rows are applied in (ts_epoch, user_id) order, so
    a replay with the same micro-batch boundaries reproduces the same
    candidate sets (decrements depend on arrival order, as in any
    Misra-Gries deployment).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    out_schema = "event_type string, user_id long, est_count long, max_count long"
    state_schema = "users array<long>, counts array<long>, decrements long"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            users, counts, dec = state.get
            mg = dict(zip(list(users), list(counts)))
            dec = int(dec)
        else:
            mg, dec = {}, 0
        batch = []
        for pdf in pdfs:
            batch.extend(
                (int(sec), int(u))
                for sec, u in zip(pdf["ts_epoch"], pdf["user_id"])
            )
        batch.sort()
        for _, u in batch:
            if u in mg:
                mg[u] += 1
            elif len(mg) < capacity:
                mg[u] = 1
            else:
                # decrement-all step; drop zeros. Each such step lowers
                # any tracked key's stored count by at most 1, so `dec`
                # bounds the total undercount of every candidate.
                mg = {v: c - 1 for v, c in mg.items() if c > 1}
                dec += 1
        if not mg:
            return
        state.update((list(mg.keys()), list(mg.values()), dec))
        yield pd.DataFrame(
            [(key[0], u, c, c + dec) for u, c in sorted(mg.items())],
            columns=["event_type", "user_id", "est_count", "max_count"],
        )

    prepared = events.selectExpr(
        "event_type", "user_id", "cast(ts as long) AS ts_epoch"
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
