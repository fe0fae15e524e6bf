"""Registry-wide cache-release hygiene (VERDICT r3 task #2).

Every query whose operators persist intermediates or cut lineage with
localCheckpoint must leave the JVM with ZERO new persistent RDDs after
the bench/cli protocol (materialize → ``release_cached_inputs``) —
leaked caches at 100 TB are an executor-storage incident, and the
round-3 attribute-tag design leaked exactly this way when query
wrappers projected operator outputs.
"""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.functions.caching import (
    persistent_rdd_ids,
    release_cached_inputs,
)
from optimal_parallel_fp_growth_spark.queries import QUERIES

# every registry entry backed by tag_cached_inputs producers
# (dedup persists shingle/signature/fingerprint frames; clustering
# persists the prepared vectors; CC/pagerank leave final-round
# checkpoint blocks)
TAGGED_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "deduped_corpus",
    "deduped_corpus_cc",
    "curate_corpus",
    "semdedup",
    "kmeans_auto",
    "supplier_pagerank",
    # score_perplexity's localCheckpoint-ed model blocks join the
    # lifecycle too (ADVICE r8 medium: they leaked before round 9)
    "lm_perplexity",
]


@pytest.mark.parametrize("name", TAGGED_QUERIES)
def test_tagged_query_releases_clean(spark, sf_small, name):
    release_cached_inputs()  # clean slate from earlier tests
    baseline = persistent_rdd_ids(spark)
    out = QUERIES[name](spark, sf_small)
    out.write.format("noop").mode("overwrite").save()
    release_cached_inputs(out)
    leaked = persistent_rdd_ids(spark) - baseline
    assert not leaked, f"{name} leaked persistent RDDs: {leaked}"


def test_localcheckpoint_rdd_ids_exact_and_race_free(spark):
    """r18 review finding: diffing persistent_rdd_ids around a
    localCheckpoint can race a concurrent thread's checkpoint into the
    cleanup set; localcheckpoint_rdd_ids reads the EXACT id off the
    checkpointed plan's LogicalRDD instead."""
    from optimal_parallel_fp_growth_spark.functions.caching import (
        localcheckpoint_rdd_ids,
        unpersist_blocks,
    )

    before = persistent_rdd_ids(spark)
    a = spark.range(0, 50).localCheckpoint()
    b = spark.range(50, 100).localCheckpoint()  # the "concurrent" cut
    ids_a = localcheckpoint_rdd_ids(a)
    ids_b = localcheckpoint_rdd_ids(b)
    new = persistent_rdd_ids(spark) - before
    # exact: each helper call returns exactly its own frame's id —
    # never the sibling's (a diff window here would return BOTH)
    assert len(ids_a) == 1 and len(ids_b) == 1
    assert ids_a.isdisjoint(ids_b)
    assert ids_a | ids_b == new
    # releasing a's blocks must leave b computable
    unpersist_blocks(spark, ids_a)
    assert b.count() == 50
    # non-checkpointed plans return empty (callers keep the diff path)
    assert localcheckpoint_rdd_ids(spark.range(3)) == set()
    unpersist_blocks(spark, ids_b)
