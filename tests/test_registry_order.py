"""Pin the driver-sampling order of the query registry.

The correctness harness samples ``queries()`` in insertion order with a
bounded per-round window (~50 rows). Round-4 rotation contract
(VERDICT r3 task #5): the 36 entries whose last green driver row is
r01/r02 lead the window, followed by entries added this round, then
r03-green canaries — so after the r4 run every registry entry has a
green row from r3 or r4 (staleness bounded to one round).
"""

from __future__ import annotations

import json
import pathlib

from optimal_parallel_fp_growth_spark import queries as Q

REPO = pathlib.Path(__file__).resolve().parents[1]

WINDOW = 50

# Entries whose newest green driver row predates r03 (VERDICT round 3,
# "What's missing" #2) plus entries added in round 4 — all must sit in
# the r4 sampling window.
MUST_BE_IN_WINDOW = {
    # green only in r01/r02
    "count_rows",
    "freq_items",
    "tokenize_distinct",
    "word_count",
    "freq_itemsets_docs",
    "revenue_by_nation",
    "top_orders",
    "dedup_lines",
    "quality_classifier",
    "text_stats",
    "repetition_signals",
    "tfidf_top_terms",
    "chunk_documents",
    "pack_sequences",
    "pii_stats",
    "decontaminate",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "deduped_corpus",
    "token_quantiles",
    "deduped_corpus_cc",
    "corpus_split",
    "mix_sources",
    "ngram_counts",
    "inverted_index",
    "source_ngram_overlap",
    "stratified_sample",
    "curate_corpus",
    "dq_documents",
    "knn_ann",
    "knn_ivf",
    "embedding_neardup",
    "label_centroids",
    # added in round 4, never driver-sampled
    "kmeans_auto",
    "semdedup_auto",
    "weighted_sample",
}


def test_stale_and_new_entries_lead_the_registry():
    head = list(Q.QUERIES)[:WINDOW]
    missing = MUST_BE_IN_WINDOW - set(head)
    assert not missing, f"stale/new entries outside window: {sorted(missing)}"


def test_window_keeps_regression_canaries():
    # heaviest plans + core mining must stay driver-watched every round
    head = set(list(Q.QUERIES)[:WINDOW])
    canaries = {
        "freq_itemsets",
        "assoc_rules",
        "transform",
        "apriori_rules",
        "freq_itemsets_pfp",
        "dedup_minhash_lsh",
        "dedup_clusters",
        "kmeans_clusters",
        "semdedup",
        "supplier_pagerank",
    }
    assert canaries <= head, f"canaries outside window: {sorted(canaries - head)}"


def test_queries_and_oracles_share_order_and_keys():
    assert list(Q.QUERIES) == list(Q.ORACLES)


def test_priority_names_all_resolve():
    # a typo in _DRIVER_PRIORITY would silently drop the entry to the tail
    unknown = [k for k in Q._DRIVER_PRIORITY if k not in Q.QUERIES]
    assert not unknown, f"_DRIVER_PRIORITY names not in registry: {unknown}"


def test_entry_module_preserves_order():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry_ordercheck__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries()) == list(Q.QUERIES)
    assert list(mod.oracle_sql()) == list(Q.ORACLES)


def test_prior_round_correctness_rows_were_all_green():
    # guards against regressing an already-driver-confirmed entry silently:
    # if these files change upstream, the canary tier should be revisited.
    for r in ("r02", "r03"):
        rows = json.loads((REPO / f"CORRECTNESS_{r}.json").read_text())
        assert all(v.get("hash_match") for v in rows.values()), r
