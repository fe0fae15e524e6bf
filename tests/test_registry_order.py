"""Pin the driver-sampling order of the query registry.

The correctness harness samples ``queries()`` in insertion order with a
bounded per-round window (exactly 50 rows in r4 and r5). Round-6
rotation contract (VERDICT r5 tasks #2 and #3): the 10 round-5 entries
with no driver row EVER lead, plus the new ``versioned_read`` row, then
the 39 r04-green entries cycling back in — together exactly filling the
window. Ten r04-green entries are deferred ONE extra round (each
pytest-differential-pinned to a twin that is r05-green or in-window)
and must lead the r7 rotation.
"""

from __future__ import annotations

import json
import pathlib

from optimal_parallel_fp_growth_spark import queries as Q

REPO = pathlib.Path(__file__).resolve().parents[1]

WINDOW = 50

# Tier 1: never driver-sampled (added round 5) + the new round-6
# versioned-table row. These have the highest staleness risk.
NEVER_SAMPLED = {
    "gopher_rules",
    "late_order_priorities",
    "sole_late_suppliers",
    "random_projection",
    "knn_hyperplane",
    "dedup_ngram_prefix",
    "negative_pairs",
    "hard_negatives",
    "dq_events",
    "events_hopping",
    "versioned_read",
    "multimodal_pixels",
}

# Tier 2: last green driver row is r04 — staleness would hit 2 rounds
# without an r6 sample.
R04_GREEN_ROTATING = {
    "count_rows",
    "tokenize_distinct",
    "freq_items",
    "freq_itemsets_pfp",
    "freq_itemsets_docs",
    "assoc_rules",
    "transform",
    "apriori_rules",
    "dedup_exact",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_lines",
    "deduped_corpus",
    "embedding_neardup",
    "decontaminate",
    "source_ngram_overlap",
    "lang_id",
    "quality_score",
    "quality_classifier",
    "doc_fingerprint",
    "token_quantiles",
    "text_stats",
    "pii_stats",
    "dq_documents",
    "ngram_counts",
    "repetition_signals",
    "tfidf_top_terms",
    "inverted_index",
    "chunk_documents",
    "pack_sequences",
    "curate_corpus",
    "corpus_split",
    "mix_sources",
    "stratified_sample",
    "weighted_sample",
    "label_centroids",
    "revenue_by_nation",
    "top_orders",
}

MUST_BE_IN_WINDOW = NEVER_SAMPLED | R04_GREEN_ROTATING

# Tier 3: r04-green, deferred one extra round because each is pinned by
# a pytest differential test to a twin with a fresher or in-window
# driver row (see the tier-3 comment in queries.py). MUST lead r7.
DEFERRED_TO_R7 = [
    "versioned_merge",  # added late in r6 (never sampled)
    # batch-5 TPC-H shapes (Q2/Q11/Q12/Q16/Q20), added after the r6
    # window filled — never sampled, locally oracle-verified:
    "min_cost_part_supplier",
    "important_parts",
    "returnflag_priority_lines",
    "supplier_variety",
    "recent_concentration_suppliers",
    # real WAV PCM/float32 sample decode + baseline JPEG codec pair
    # (r6) — never sampled, locally oracle-verified:
    "multimodal_audio",
    "multimodal_jpeg",
    # cross-doc repeated-substring signal + Z-order layout lifecycle
    # (r6) — never sampled, locally oracle-verified:
    "repeated_spans",
    "zorder_layout_read",
    # Q5 shape completing the 22-query TPC-H matrix (r6):
    "local_supplier_revenue",
    "word_count",
    "kmeans_clusters",
    "kmeans_auto",
    "semdedup",
    "semdedup_auto",
    "knn_ivf",
    "knn_ann",
    "supplier_pagerank",
    "dedup_minhash_lsh",
    "freq_itemsets",
    "deduped_corpus_cc",
]


def test_stale_and_new_entries_lead_the_registry():
    head = list(Q.QUERIES)[:WINDOW]
    missing = MUST_BE_IN_WINDOW - set(head)
    assert not missing, f"stale/new entries outside window: {sorted(missing)}"


def test_window_is_exactly_the_must_sample_set():
    # tier1 + tier2 is sized to EXACTLY fill the 50-row window — a
    # drift here means either a stale entry got pushed out or a fresh
    # one is wasting a window slot.
    assert len(MUST_BE_IN_WINDOW) == WINDOW
    assert set(list(Q.QUERIES)[:WINDOW]) == MUST_BE_IN_WINDOW


def test_deferred_entries_lead_r7_rotation():
    order = list(Q.QUERIES)
    assert order[WINDOW : WINDOW + len(DEFERRED_TO_R7)] == DEFERRED_TO_R7


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
    for r in ("r02", "r03", "r04", "r05"):
        rows = json.loads((REPO / f"CORRECTNESS_{r}.json").read_text())
        assert all(v.get("hash_match") for v in rows.values()), r


def test_bench_query_names_all_resolve():
    """Every registry-query name bench.py times must exist in the
    registry — a typo would crash the driver's per-round bench run."""
    import re

    src = (REPO / "bench.py").read_text()
    # the timed-loop tuple is the only place bare query names appear
    # as "name", lines; collect all string literals that match registry
    # naming and appear in the for-loop tuple section
    loop = src.split("# ---- headline analytic queries")[1]
    loop = loop.split("q = QUERIES[qname]")[0]
    names = re.findall(r'"([a-z][a-z0-9_]+)"', loop)
    assert len(names) > 50  # the tuple is really being scanned
    unknown = [n for n in names if n not in Q.QUERIES]
    assert not unknown, f"bench.py names not in registry: {unknown}"
