"""Hypothesis property tests for the pure manifest-side guards
(round 14): the bucket-stamp naming guard and the mask-key rename
resolution. Both are pure python — no SparkSession — so the search
is cheap and wide."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from optimal_parallel_fp_growth_spark.sources.versioned import (
    _resolve_mask_key,
    _stamp_buckets,
)

UIDS = ["aaaa-bbbb-1111", "cccc-dddd-2222"]


@st.composite
def file_sets(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    k = draw(st.integers(min_value=0, max_value=10))
    files = []
    truth = {}
    for i in range(k):
        kind = draw(st.sampled_from(["clean", "split", "over", "junk"]))
        if kind == "junk":
            name = draw(st.sampled_from(["run-3.parquet", "data.bin", "part-x-c0.parquet"]))
            files.append(f"data/v00000001/{name}-{i}")
            truth[files[-1]] = None
            continue
        idx = draw(st.integers(min_value=0, max_value=n + 2))
        uid = draw(st.sampled_from(UIDS))
        cseq = draw(st.integers(min_value=0, max_value=2))
        if kind == "clean":
            cseq = 0
        if kind == "over":
            idx = n + draw(st.integers(min_value=0, max_value=2))
        f = f"data/v00000001/part-{idx:05d}-{uid}-c{cseq:03d}.snappy.parquet"
        if f in truth:
            continue
        files.append(f)
        truth[f] = idx if idx < n else None
    allow = draw(st.booleans())
    return n, files, truth, allow


@given(file_sets())
@settings(max_examples=300, deadline=None)
def test_stamp_guard_never_records_a_wrong_bucket(case):
    """THE invariant: whatever the file set looks like, a recorded
    stamp equals the file's true partition index — a wrong stamp is
    impossible; the only legal failure mode is NO stamp."""
    n, files, truth, allow = case
    stats = {f: {} for f in files}
    _stamp_buckets(stats, files, n, allow_splits=allow)
    stamped = {f: s.get("__bucket") for f, s in stats.items()}
    for f, b in stamped.items():
        if b is not None:
            assert truth[f] is not None and b == truth[f], (f, b)
    # deterministic: running twice stamps identically
    stats2 = {f: {} for f in files}
    _stamp_buckets(stats2, files, n, allow_splits=allow)
    assert {f: s.get("__bucket") for f, s in stats2.items()} == stamped


@given(file_sets())
@settings(max_examples=300, deadline=None)
def test_stamp_guard_all_or_nothing(case):
    n, files, truth, allow = case
    stats = {f: {} for f in files}
    _stamp_buckets(stats, files, n, allow_splits=allow)
    stamped = [s.get("__bucket") for s in stats.values()]
    assert (
        all(b is None for b in stamped)
        or all(b is not None for b in stamped)
    ), "partial stamping must be impossible"


@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=8,
             unique=True),
    st.integers(min_value=0, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_resolve_mask_key_walks_chains_exactly(steps, start):
    """Random forward chains c0→c1→…: resolution from any link lands
    on the first chain member present in the frame, in order, or
    raises — never skips past a present name, never invents one."""
    names = [f"c{i}" for i in steps]
    chain = [[names[i], names[i + 1]] for i in range(len(names) - 1)]
    key = names[min(start, len(names) - 1) % len(names)]
    pos = names.index(key)
    # choose the present set as a suffix of the chain after key
    for present_at in range(pos, len(names)):
        have = {names[present_at], "other"}
        got = _resolve_mask_key(key, have, chain)
        assert got == names[present_at]
    # nothing present → must raise, not guess
    with pytest.raises(ValueError, match="no current column"):
        _resolve_mask_key(key, {"other"}, chain)
