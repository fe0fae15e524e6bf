"""Cache-lifecycle bookkeeping for operators that persist() an
intermediate the returned (lazy) plan references more than once.

The operator cannot unpersist before the caller materializes the
result, and a long-lived session that never evicts accumulates cached
intermediates until executor storage pressure does it for us. So every
such operator tags the persisted inputs onto the DataFrame it returns;
the caller releases them once the result is materialized (written,
collected, or checkpointed):

    pairs = minhash_lsh_pairs(docs)
    pairs.write.parquet(out)
    release_cached_inputs(pairs)

Not calling it is safe — Spark's LRU storage eviction remains the
backstop — but repeated pipeline invocations in one session should
release explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TAG = "_opfpg_cached_inputs"


def tag_cached_inputs(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record ``cached`` (persisted upstream DataFrames) on ``out`` so
    :func:`release_cached_inputs` can free them later."""
    existing = list(getattr(out, _TAG, []))
    setattr(out, _TAG, existing + list(cached))
    return out


def release_cached_inputs(df: DataFrame) -> int:
    """Unpersist every cached intermediate tagged on ``df`` (no-op for
    untagged DataFrames). Call AFTER materializing ``df`` — the cache
    is what makes the multi-reference plan cheap. Returns the number of
    intermediates released."""
    cached = getattr(df, _TAG, [])
    for c in cached:
        c.unpersist()
    n = len(cached)
    if cached:
        setattr(df, _TAG, [])
    return n
