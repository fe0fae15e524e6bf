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
reordering upstream or is accepted as first-arrival-wins).
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


def first_seen_dedup(events: DataFrame) -> DataFrame:
    """Streaming first-occurrence dedup per (user_id, event_type).
    Input must be a streaming DataFrame with ts/event_id/value."""
    prepared = events.selectExpr(
        "user_id", "event_type", "cast(ts as long) AS ts_epoch", "event_id", "value"
    )
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        _first_seen_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
