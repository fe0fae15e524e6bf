"""Connected-components clustering + deterministic sampling operators.

CC is checked against hand-computed components and a Python union-find
over the same minhash pairs (differential, like the mining core tests);
sampling is checked for determinism, exactness of the bucket rule, and
independence between salts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    minhash_lsh_pairs,
)
from optimal_parallel_fp_growth_spark.operators.sampling import (
    BUCKETS,
    corpus_split,
    mix_sources,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# connected components


def test_cc_hand_graph(spark):
    # chain 1-2-3, separate pair 10-11, triangle 20-21-22 (+ redundant edge)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["u"], r["component"]) for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_cc_long_chain_converges(spark):
    # a 12-node path is the worst case for min-label propagation:
    # the label must walk the full diameter.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    labels = connected_components(edges).collect()
    assert {r["component"] for r in labels} == {0}
    assert len(labels) == 12


def test_cc_max_iterations_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2)


def test_cc_star_matches_label_on_hand_and_random_graphs(spark):
    """Differential: the large-star/small-star variant must produce the
    identical labelling as min-label propagation and the union-find
    reference on assorted graph shapes."""
    import random

    rng = random.Random(11)
    shapes = [
        # hand shapes: chain, pair, triangle+redundant, star, two chains
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        [(i, i + 1) for i in range(11)],
        [(0, i) for i in range(1, 8)] + [(100, 101), (101, 102)],
        # random graphs: sparse and denser
        [(rng.randrange(60), rng.randrange(60)) for _ in range(40)],
        [(rng.randrange(30), rng.randrange(30)) for _ in range(120)],
    ]
    for pairs in shapes:
        pairs = [(a, b) for a, b in pairs if a != b]
        edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        label = {
            (r["u"], r["component"])
            for r in connected_components(edges, algorithm="label").collect()
        }
        star = {
            (r["u"], r["component"])
            for r in connected_components(edges, algorithm="star").collect()
        }
        assert star == label, pairs
        expected = set(_union_find(pairs).items())
        assert star == expected, pairs


def test_cc_star_beats_diameter_on_long_chain(spark):
    """A 33-node path needs ~diameter rounds of label propagation but
    only O(log n) star rounds — 6 iterations must suffice where the
    label variant raises."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, algorithm="label", max_iterations=6)
    labels = connected_components(
        edges, algorithm="star", max_iterations=6
    ).collect()
    assert {r["component"] for r in labels} == {0}
    assert len(labels) == 33


def test_cc_unknown_algorithm_raises(spark):
    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="algorithm"):
        connected_components(edges, algorithm="bogus")


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dedup_clusters_matches_union_find(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
    ]
    assert pairs, "fixture should contain near-dup pairs"
    expected = _union_find(pairs)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, threshold=0.2).collect()
    }
    assert len(got) == docs.count()
    for doc_id, cluster in got.items():
        assert cluster == expected.get(doc_id, doc_id)
    # one survivor per cluster: survivors are exactly the label values
    survivors = {d for d, c in got.items() if d == c}
    assert survivors == set(got.values())


# ---------------------------------------------------------------------------
# sampling


def test_corpus_split_total_and_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out1 = corpus_split(docs).select("doc_id", "split").collect()
    out2 = corpus_split(docs).select("doc_id", "split").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_split = {}
    for r in out1:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    # every doc in exactly one split; train dominates at 0.9 weight
    assert sum(len(v) for v in by_split.values()) == docs.count()
    assert len(by_split["train"]) > len(by_split.get("val", set()))
    assert len(by_split["train"]) > len(by_split.get("test", set()))


def test_corpus_split_stable_under_corpus_growth(spark):
    docs = load_table(spark, SF_DIR, "documents")
    full = {
        r["doc_id"]: r["split"]
        for r in corpus_split(docs).select("doc_id", "split").collect()
    }
    half = {
        r["doc_id"]: r["split"]
        for r in corpus_split(docs.where(F.col("doc_id") % 2 == 0))
        .select("doc_id", "split")
        .collect()
    }
    assert half == {d: s for d, s in full.items() if d % 2 == 0}


def test_corpus_split_validates_weights(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="sum to 1"):
        corpus_split(docs, (("a", 0.5), ("b", 0.1)))
    with pytest.raises(ValueError, match="non-negative"):
        corpus_split(docs, (("a", 1.5), ("b", -0.5)))


def test_mix_sources_rates_and_zero(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rates = {"src0": 0.5, "src1": 0.0}
    kept = mix_sources(docs, rates)
    assert kept.columns == docs.columns
    per_source = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "src1" not in per_source  # rate 0 drops everything
    assert 0 < per_source["src0"] < totals["src0"]  # strictly downsampled
    # unlisted sources keep default_rate=1.0
    for s, n in totals.items():
        if s not in rates:
            assert per_source[s] == n


def test_mix_and_split_salts_independent(spark):
    # With the same salt, "kept at rate 0.5" and bucket-based splits
    # would be correlated; distinct salts must give ~independent picks.
    docs = load_table(spark, SF_DIR, "documents")
    split = corpus_split(docs, (("lo", 0.5), ("hi", 0.5)))
    kept = set(
        r["doc_id"] for r in mix_sources(docs, {}, default_rate=0.5)
        .select("doc_id").collect()
    )
    lo = set(
        r["doc_id"] for r in split.where(F.col("split") == "lo")
        .select("doc_id").collect()
    )
    n = docs.count()
    overlap = len(kept & lo)
    # independent halves overlap in ~n/4; same-salt would give n/2 or 0.
    assert 0.10 * n < overlap < 0.40 * n


def test_mix_sources_validates_rates(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="must be in"):
        mix_sources(docs, {"src0": 1.5})
    with pytest.raises(ValueError, match="default_rate"):
        mix_sources(docs, {}, default_rate=-0.1)


def test_deduped_corpus_cc_policy(spark):
    from optimal_parallel_fp_growth_spark.operators.dedup import deduped_corpus

    docs = load_table(spark, SF_DIR, "documents")
    greedy = {r["doc_id"] for r in deduped_corpus(docs, threshold=0.2).collect()}
    cc = {
        r["doc_id"]
        for r in deduped_corpus(docs, threshold=0.2, policy="cc").collect()
    }
    # cc keeps exactly the component minima that also survive exact dedup:
    # every cc survivor with near-dups is its cluster's min id, so the
    # greedy pass (which drops any doc_b) can never keep fewer minima.
    assert cc and greedy
    pairs = minhash_lsh_pairs(docs, threshold=0.2).select("doc_a", "doc_b").collect()
    comp = _union_find([(r["doc_a"], r["doc_b"]) for r in pairs])
    for d in cc:
        assert comp.get(d, d) == d  # a survivor is its component's min

    with pytest.raises(ValueError, match="unknown dedup policy"):
        deduped_corpus(docs, policy="bogus")


def test_cc_bucketed_edges_matches_default(spark):
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    before = {t.name for t in spark.catalog.listTables()}
    got = {
        (r["u"], r["component"])
        for r in connected_components(edges, bucketed_edges=True).collect()
    }
    want = {
        (r["u"], r["component"]) for r in connected_components(edges).collect()
    }
    assert got == want
    # temp bucketed edge table dropped before returning
    assert {t.name for t in spark.catalog.listTables()} == before


def test_cc_bucketed_edges_rejects_star(spark):
    edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="label variant only"):
        connected_components(edges, algorithm="star", bucketed_edges=True)


def test_cc_auto_dispatch_crossover(spark, monkeypatch):
    """auto rides the existing edge count and flips to the bucketed
    layout at the crossover with identical components; star + auto is
    fine (no loop-invariant side, auto just doesn't apply)."""
    from optimal_parallel_fp_growth_spark.operators import dedup as D

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    want = {
        (r["u"], r["component"])
        for r in connected_components(edges, bucketed_edges=False).collect()
    }
    monkeypatch.setattr(D, "_graph_bucketed_crossover", lambda: 1)
    before = {t.name for t in spark.catalog.listTables()}
    got = {
        (r["u"], r["component"]) for r in connected_components(edges).collect()
    }
    assert got == want
    assert {t.name for t in spark.catalog.listTables()} == before
    # star ignores auto instead of raising
    assert connected_components(edges, algorithm="star").count() == 8
