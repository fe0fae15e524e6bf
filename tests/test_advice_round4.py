"""Round-4 ADVICE items: iterative operators must not unpersist caches
that first materialize inside their own block-hygiene diff windows
(connected_components' own edge cache, registry-pending upstream caches
under pagerank), and interleaved checkpoint-backed builds need scoped
release so freeing one query's blocks cannot break another's.

The recompute tests use a Spark accumulator bumped by a Python UDF in
the edge plan: a surviving cache means the UDF runs exactly once per
materialization; a cache freed mid-operator forces re-derivation and
the accumulator overshoots. Local mode runs no speculative/retried
tasks, so the counts are exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from optimal_parallel_fp_growth_spark.functions import caching
from optimal_parallel_fp_growth_spark.functions.caching import (
    cache_scope,
    release_cached_inputs,
    tag_cached_inputs,
)
from optimal_parallel_fp_growth_spark.operators.dedup import connected_components
from optimal_parallel_fp_growth_spark.operators.graph import pagerank


def _tracked_edges(spark, pairs):
    """Edge DataFrame whose every source-scan row bumps an accumulator."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf(LongType())
    def track(x):
        acc.add(1)
        return x

    df = spark.createDataFrame(pairs, "a long, b long").select(
        track("a").alias("doc_a"), F.col("b").alias("doc_b")
    )
    return df, acc


def test_cc_edge_cache_survives_rounds(spark):
    """ADVICE r4 #1: the label-CC edge cache (`und`) must materialize
    BEFORE the persistent-id baseline is captured; otherwise its cache
    id lands in round 1's checkpoint-block diff and is unpersisted,
    recomputing the union+distinct edge list every later round."""
    release_cached_inputs()
    # a 10-edge chain: diameter 10 -> ~10 label-propagation rounds,
    # so a freed cache would re-scan the source many times over
    pairs = [(i, i + 1) for i in range(10)]
    edges, acc = _tracked_edges(spark, pairs)
    cc = connected_components(edges, max_iterations=20)
    rows = {(r.u, r.component) for r in cc.collect()}
    assert rows == {(i, 0) for i in range(11)}
    # union reads the tracked scan twice (plain + swapped branch); the
    # persisted result must serve every round after that. The buggy
    # path re-runs both branches per round (>= 2 * E * rounds).
    assert acc.value == 2 * len(pairs)
    release_cached_inputs()


def test_pagerank_preserves_registry_pending_cache(spark):
    """ADVICE r4 #4: a registry-pending upstream cache that first
    materializes under pagerank's e-cut must NOT be swept into e_ids
    and unpersisted mid-operator — the caller registered it for
    multi-reference use after the operator returns."""
    release_cached_inputs()
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    edges, acc = _tracked_edges(spark, pairs)
    up = edges.persist()  # lazy: no blocks exist yet
    out = tag_cached_inputs(up, up)  # operator-style registration
    pr = pagerank(out, n_iter=2, src="doc_a", dst="doc_b")
    assert pr.count() == 6
    after_pr = acc.value
    # the multi-reference the cache was registered for: a later read
    # must hit blocks, not re-run the scan
    up.count()
    assert acc.value == after_pr == len(pairs)
    assert release_cached_inputs() >= 1  # up + pagerank's block handle


def test_cache_scope_isolates_checkpoint_backed_results(spark):
    """ADVICE r4 #2: two checkpoint-backed results built before either
    is materialized — releasing the first's scope must leave the
    second's localCheckpoint blocks intact (lineage is cut, so a
    registry-wide release would make it irrecoverable)."""
    release_cached_inputs()
    e1 = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    e2 = spark.createDataFrame([(7, 8), (8, 9)], "doc_a long, doc_b long")
    with cache_scope() as s1:
        cc1 = connected_components(e1)
    with cache_scope() as s2:
        cc2 = connected_components(e2)
    # scoped registrations must not leak into the global registry
    assert release_cached_inputs() == 0
    assert cc1.count() == 3
    assert s1.release() >= 1
    assert s1.release() == 0  # idempotent
    # cc2's blocks must still be alive after s1's release
    assert {r.component for r in cc2.collect()} == {7}
    assert s2.release() >= 1


def test_nested_scopes_capture_innermost(spark):
    release_cached_inputs()
    df = spark.range(3).persist()
    with cache_scope() as outer:
        tag_cached_inputs(df, df)
        with cache_scope() as inner:
            df2 = spark.range(4).persist()
            tag_cached_inputs(df2, df2)
        assert inner.release() == 1
    assert outer.release() == 1
    assert release_cached_inputs() == 0


def test_materialize_pending_caches_counts_lazy_registrations(spark):
    release_cached_inputs()
    df = spark.range(5).persist()
    tag_cached_inputs(df, df)
    assert caching.materialize_pending_caches() == 1
    ids = caching.persistent_rdd_ids(spark)
    assert ids  # blocks exist before any caller action
    assert release_cached_inputs() == 1
