"""Streaming MinHash-LSH near-duplicate suppression
(``applyInPandasWithState``; engine addition, SURVEY §2.8 family).

The streaming twin of the incremental batch flow
(``operators/dedup.py::dedup_against_index``): every arriving document
computes its 16-component minhash signature and banded LSH keys with
the SAME md5-derived hash family as the batch operators, then each
band bucket keeps ONE admitted owner in state — later documents
landing in an owned bucket emit a candidate row
(doc_id, dup_of, n_agree, band_key), where ``n_agree`` is the count of
agreeing signature components against the owner (the standard minhash
estimator numerator: est_jaccard = n_agree / num_hashes). Downstream
consumers threshold/aggregate candidates per doc (any band, est ≥ τ)
— the same verify contract as the batch ``verify='signatures'`` tier.

State per bucket is one (owner, 16-long signature) entry — bounded by
|distinct band buckets|, never by stream length; the one exchange is
the band-key groupBy. Owner choice is min(doc_id) within the first
batch that touches a bucket, so a feed ordered by doc_id across
batches reproduces the batch min-owner exactly
(``tests/test_streaming_neardup.py`` pins stream == batch); unordered
feeds get first-batch-wins owners — the usual arrival-order contract
of streaming dedup (see ``stateful.first_seen_dedup`` notes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from optimal_parallel_fp_growth_spark.operators.dedup import (
    NUM_BANDS,
    NUM_HASHES,
    _band_key_col,
    minhash_signatures,
)

NEARDUP_OUTPUT_SCHEMA = "doc_id long, dup_of long, n_agree int, band_key string"
NEARDUP_STATE_SCHEMA = "owner long, sig array<long>"


def _neardup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows: list[tuple[int, list[int]]] = []
    for pdf in pdfs:
        for d, s in zip(pdf["doc_id"], pdf["sig"]):
            rows.append((int(d), [int(x) for x in s]))
    if not rows:
        return
    rows.sort(key=lambda r: r[0])
    if state.exists:
        owner, osig = state.get
        osig = list(osig)
    else:
        owner, osig = rows[0]
        state.update((owner, list(osig)))
        rows = rows[1:]
    if not rows:
        return
    # d != owner: an at-least-once re-delivery of the admitted owner in
    # a LATER micro-batch would otherwise emit a perfect self-candidate
    # (n_agree == len(sig)) and downstream thresholding would suppress
    # the document as a duplicate of itself — the batch tier excludes
    # self-pairs via doc_a < doc_b, so the stream must too.
    out = [
        (d, owner, sum(a == b for a, b in zip(s, osig)), key[0])
        for d, s in rows
        if d != owner
    ]
    if not out:
        return
    yield pd.DataFrame(
        out, columns=["doc_id", "dup_of", "n_agree", "band_key"]
    )


def streaming_neardup(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 2,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    ttl: str | None = None,
    ts_col: str = "ts",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Near-dup candidate stream over a streaming documents frame
    (must carry doc_id + ``text_col``). Signature/band computation is
    the batch operators' codegen'd expression chain (no Python until
    the per-bucket state step); output rows are LSH candidates with
    their signature-agreement count — threshold downstream at
    ``n_agree >= ceil(tau * num_hashes)``.

    ``ttl=None`` keeps every bucket owner forever — state grows with
    |distinct band buckets|. For an unbounded crawl pass
    ``ttl="30 days"``-style expiry (requires an event-time ``ts_col``):
    a bucket's owner drops once the watermark passes its last activity
    + ttl, bounding state to buckets active inside one ttl window —
    the same exactness-for-boundedness trade as
    ``first_seen_dedup(ttl=...)``: a near-dup arriving after the gap
    re-admits as a fresh owner instead of being flagged."""
    # minhash_signatures always emits the fixed NUM_HASHES-component
    # signature; a different num_hashes would make _band_key_col slice
    # past (or short of) the signature and silently produce degenerate
    # band keys. Fail loudly until the hash family is parameterized.
    if num_hashes != NUM_HASHES:
        raise ValueError(
            f"num_hashes={num_hashes} unsupported: minhash_signatures "
            f"emits exactly {NUM_HASHES} components"
        )
    if num_hashes % num_bands != 0:
        raise ValueError(
            f"num_bands={num_bands} must divide num_hashes={num_hashes}"
        )
    rows = num_hashes // num_bands
    if ttl is None:
        sigs = minhash_signatures(docs, text_col, k)
        bands = sigs.select(
            "doc_id", "sig", _band_key_col(num_bands, rows).alias("band_key")
        )
        return bands.groupBy("band_key").applyInPandasWithState(
            _neardup_fn,
            NEARDUP_OUTPUT_SCHEMA,
            NEARDUP_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )

    from optimal_parallel_fp_growth_spark.streaming.stateful import _duration_ms

    ttl_ms = _duration_ms(ttl)
    docs = docs.withWatermark(ts_col, watermark)
    sigs = minhash_signatures(docs, text_col, k, keep_cols=(ts_col,))
    bands = sigs.select(
        "doc_id", ts_col, "sig", _band_key_col(num_bands, rows).alias("band_key")
    )

    def fn_ttl(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last bucket activity + ttl: drop owner
            state.remove()
            return
        rows_: list[tuple[int, list[int]]] = []
        last_ms = 0
        for pdf in pdfs:
            for d, t, s in zip(pdf["doc_id"], pdf[ts_col], pdf["sig"]):
                rows_.append((int(d), [int(x) for x in s]))
                last_ms = max(last_ms, int(pd.Timestamp(t).value // 1_000_000))
        if not rows_:
            return
        rows_.sort(key=lambda r: r[0])
        if state.exists:
            owner, osig = state.get
            osig = list(osig)
        else:
            owner, osig = rows_[0]
            rows_ = rows_[1:]
        # refresh owner + timer on every batch that touches the bucket
        state.update((owner, list(osig)))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
        if not rows_:
            return
        # same self-candidate guard as _neardup_fn (owner re-delivery)
        out = [
            (d, owner, sum(a == b for a, b in zip(s, osig)), key[0])
            for d, s in rows_
            if d != owner
        ]
        if not out:
            return
        yield pd.DataFrame(
            out, columns=["doc_id", "dup_of", "n_agree", "band_key"]
        )

    return bands.groupBy("band_key").applyInPandasWithState(
        fn_ttl,
        NEARDUP_OUTPUT_SCHEMA,
        NEARDUP_STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )
