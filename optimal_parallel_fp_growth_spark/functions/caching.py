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

**Protocol**: build ONE query, materialize it, release, repeat. The
registry-wide release is only safe under that sequencing — if two
checkpoint-backed results (``RddBlockHandle`` entries from
connected_components / pagerank) are both pending, releasing after the
first frees the second's localCheckpoint blocks, and since a
checkpoint's lineage is CUT the second result then fails irrecoverably
instead of recomputing. Callers that genuinely interleave queries must
isolate each build in a :func:`cache_scope`:

    with cache_scope() as s1:
        cc = dedup_clusters(docs)          # registrations land in s1
    with cache_scope() as s2:
        pr = pagerank(edges)               # registrations land in s2
    cc.write.parquet(a); s1.release()      # frees only cc's inputs
    pr.write.parquet(b); s2.release()      # pr's blocks were untouched

All registry mutation is lock-guarded, so concurrent query threads
sharing one SparkSession can each hold their own scope safely.

Not calling release at all is safe for plain caches — Spark's LRU
storage eviction remains the backstop — but repeated pipeline
invocations in one session should release explicitly.
"""

from __future__ import annotations

import threading
from contextlib import AbstractContextManager

from pyspark.sql import DataFrame

_LOCK = threading.RLock()

# Persisted intermediates registered by operators, pending release.
# Module-scoped (one interpreter == one SparkSession in this engine);
# deliberately NOT keyed by output DataFrame — see module docstring.
_PENDING: list = []

# Active cache_scope stack (innermost last); registrations target the
# innermost scope when one is open, else the global _PENDING list.
_SCOPES: list["CacheScope"] = []


class CacheScope(AbstractContextManager):
    """Collects the cache registrations made while it is the innermost
    open scope, so they can be released independently of the global
    registry (see module docstring). ``release()`` may be called after
    the ``with`` block exits — exiting only stops *capturing*, it does
    not free anything."""

    def __init__(self) -> None:
        self._caches: list = []

    def __enter__(self) -> "CacheScope":
        with _LOCK:
            _SCOPES.append(self)
        return self

    def __exit__(self, *exc) -> None:
        with _LOCK:
            if self in _SCOPES:
                _SCOPES.remove(self)

    def release(self) -> int:
        """Unpersist everything captured by this scope. Idempotent."""
        with _LOCK:
            caches, self._caches = self._caches, []
        for c in caches:
            c.unpersist()
        return len(caches)


def cache_scope() -> CacheScope:
    """Open an isolated registration scope — use one per query when
    building several cache/checkpoint-backed results before
    materializing any of them."""
    return CacheScope()


def tag_cached_inputs(out: DataFrame, *cached) -> DataFrame:
    """Record ``cached`` (persisted upstream DataFrames or
    :class:`RddBlockHandle` s) so :func:`release_cached_inputs` — or the
    innermost open :class:`CacheScope` — can free them later. Returns
    ``out`` unchanged (pass-through so operators can tag in a return
    expression)."""
    with _LOCK:
        target = _SCOPES[-1]._caches if _SCOPES else _PENDING
        target.extend(cached)
    return out


def materialize_pending_caches() -> int:
    """Force every pending *lazy* cache registration (global and open
    scopes) to materialize now. Iterative operators call this BEFORE
    snapshotting :func:`persistent_rdd_ids`: a persisted-but-
    unmaterialized upstream cache would otherwise first materialize
    inside the operator's own id-diff window, land in a
    round-block-hygiene diff, and be unpersisted mid-operator —
    silently defeating the multi-reference cache its operator
    registered it for (e.g. the minhash signature cache under
    ``dedup_clusters``). The work is not wasted: by protocol a pending
    cache is referenced by the query being built, so it would have been
    materialized by the first downstream action anyway. Returns the
    number of caches counted."""
    with _LOCK:
        pend = list(_PENDING)
        for s in _SCOPES:
            pend.extend(s._caches)
    n = 0
    for c in pend:
        if isinstance(c, DataFrame):
            c.count()
            n += 1
        # RddBlockHandle entries are materialized by construction
    return n


def persistent_rdd_ids(spark) -> set[int]:
    """IDs of every RDD currently persisted in the JVM (caches AND
    localCheckpoint blocks). ``DataFrame`` exposes no unpersist for
    checkpoint blocks, and ``df.rdd`` derives a NEW RDD whose unpersist
    would not touch the checkpointed one — free them by diffing this
    around the ``localCheckpoint`` call, or (race-free, preferred when
    the checkpointed frame is at hand) via
    :func:`localcheckpoint_rdd_ids`."""
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def localcheckpoint_rdd_ids(df) -> set[int]:
    """Exact persisted-RDD id of a ``localCheckpoint()``-ed DataFrame,
    read off its analyzed ``LogicalRDD`` node. Unlike diffing
    :func:`persistent_rdd_ids` around the checkpoint call, this cannot
    race a CONCURRENT thread's checkpoint into the cleanup set (the
    diff window would capture it, and the later
    :func:`unpersist_blocks` would cut that thread's lineage
    irrecoverably). Returns an empty set when the plan is not a bare
    LogicalRDD or the JVM accessors are unavailable — callers keep the
    diff protocol as the fallback."""
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getSimpleName() != "LogicalRDD":
            return set()
        return {int(node.rdd().id())}
    except Exception:  # noqa: BLE001 — cleanup precision, never fatal
        return set()


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


def session_temp_layout(spark, prefix: str):
    """Context manager for the layout-lifecycle registry entries
    (write → read-back → rollup over a session-temp directory):
    yields ``(tmp_dir, materialize)`` where ``materialize(out)``
    localCheckpoints the result, diffs the persistent-block ids, and
    returns it tagged with the :class:`RddBlockHandle` — the exact
    sequence `zorder_layout_read` / `hive_layout_read` /
    `compacted_layout_read` previously each hand-rolled (review r11).
    The temp directory is removed at exit, AFTER materialize has
    checkpointed the result off the about-to-vanish files."""
    import contextlib
    import shutil as _shutil
    import tempfile
    import uuid

    @contextlib.contextmanager
    def _cm():
        tdir = tempfile.mkdtemp(prefix=f"opfpg_{prefix}_{uuid.uuid4().hex}_")

        def materialize(out: DataFrame) -> DataFrame:
            seen = persistent_rdd_ids(spark)
            res = out.localCheckpoint()
            ids = persistent_rdd_ids(spark) - seen
            return tag_cached_inputs(res, RddBlockHandle(spark, ids))

        try:
            yield tdir, materialize
        finally:
            _shutil.rmtree(tdir, ignore_errors=True)

    return _cm()


def release_cached_inputs(df: DataFrame | None = None) -> int:
    """Unpersist every cached intermediate registered (outside any
    :func:`cache_scope`) since the last release — no-op when nothing is
    pending. Call AFTER materializing the query's result — the cache is
    what makes the multi-reference plan cheap, and checkpoint-backed
    results (``RddBlockHandle``) CANNOT be re-executed after release.
    The ``df`` argument is accepted for call-site compatibility and
    ignored: releasing is registry-wide, so wrapped / projected results
    release their operators' caches too (single-pending-query protocol;
    interleaved builds need :func:`cache_scope`). Returns the number of
    intermediates released."""
    with _LOCK:
        caches, _PENDING[:] = list(_PENDING), []
    n = 0
    for c in caches:
        c.unpersist()
        n += 1
    return n
