"""Cache-lifecycle bookkeeping for operators that persist() an
intermediate the returned (lazy) plan references more than once.

The operator cannot unpersist before the caller materializes the
result, and a long-lived session that never evicts accumulates cached
intermediates until executor storage pressure does it for us. So every
such operator REGISTERS the persisted inputs in a module-scoped
registry; the caller releases them once the result is materialized
(written, collected, or checkpointed):

    pairs = minhash_lsh_pairs(docs)
    pairs.write.parquet(out)
    release_cached_inputs(pairs)

Why a registry and not an attribute on the returned DataFrame: a
Python attribute is lost the moment a caller wraps the result
(``.select``, ``.join``, ``.where`` all build NEW DataFrame objects),
which silently leaked the fattest intermediates (e.g. dedup_clusters
projecting minhash_lsh_pairs' output dropped the tag and the persisted
signature DataFrame survived the release call — at 100 TB that is an
executor-memory incident). The registry survives any amount of
wrapping; ``release_cached_inputs`` frees everything registered since
the last release, which matches the run-one-query-then-release
protocol of bench.py / cli.py exactly.

Not calling it is safe — Spark's LRU storage eviction remains the
backstop — but repeated pipeline invocations in one session should
release explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Persisted intermediates registered by operators, pending release.
# Module-scoped (one interpreter == one SparkSession in this engine);
# deliberately NOT keyed by output DataFrame — see module docstring.
_PENDING: list[DataFrame] = []


def tag_cached_inputs(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record ``cached`` (persisted upstream DataFrames) so
    :func:`release_cached_inputs` can free them later. Returns ``out``
    unchanged (pass-through so operators can tag in a return
    expression)."""
    _PENDING.extend(cached)
    return out


def persistent_rdd_ids(spark) -> set[int]:
    """IDs of every RDD currently persisted in the JVM (caches AND
    localCheckpoint blocks). Diffing this around a ``localCheckpoint``
    call is the only way to later free the checkpoint's blocks —
    ``DataFrame`` exposes no unpersist for them, and ``df.rdd`` derives
    a NEW RDD whose unpersist would not touch the checkpointed one."""
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def unpersist_blocks(spark, ids) -> int:
    """Unpersist the JVM RDDs with the given ids (ids already gone are
    skipped). Returns the number actually unpersisted."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for i in ids:
        r = jmap.get(i)
        if r is not None:
            r.unpersist()
            n += 1
    return n


class RddBlockHandle:
    """``unpersist()``-compatible handle over checkpoint-block RDD ids,
    so iterative operators (connected components, PageRank) can hand
    their FINAL round's localCheckpoint blocks to the same
    tag/release lifecycle as persisted DataFrames.

    Caveat the caller owns: a localCheckpoint has no lineage, so after
    release the returned DataFrame cannot be re-executed — release
    only once the result is fully materialized and done with."""

    def __init__(self, spark, ids):
        self._spark = spark
        self._ids = set(ids)

    def unpersist(self) -> None:
        unpersist_blocks(self._spark, self._ids)
        self._ids.clear()


def release_cached_inputs(df: DataFrame | None = None) -> int:
    """Unpersist every cached intermediate registered since the last
    release (no-op when nothing is pending). Call AFTER materializing
    the query's result — the cache is what makes the multi-reference
    plan cheap. The ``df`` argument is accepted for call-site
    compatibility and ignored: releasing is registry-wide, so wrapped /
    projected results release their operators' caches too. Returns the
    number of intermediates released."""
    n = 0
    while _PENDING:
        _PENDING.pop().unpersist()
        n += 1
    return n
