"""Pin the driver-sampling order of the query registry.

The correctness harness samples ``queries()`` in insertion order with a
bounded per-round window (~50 rows). Round-5 rotation contract
(VERDICT r4 task #2): the two Arrow entries added this round lead
(never sampled), then the 39 entries whose last green driver row is
r03, then r04-green canaries — so after the r5 run every registry
entry has a green row from r4 or r5 (staleness bounded to one round).
"""

from __future__ import annotations

import json
import pathlib

from optimal_parallel_fp_growth_spark import queries as Q

REPO = pathlib.Path(__file__).resolve().parents[1]

WINDOW = 50

# Entries with no driver row yet (added round 5) plus entries whose
# newest green driver row is r03 (outside the r04 window) — all must
# sit in the r5 sampling window.
MUST_BE_IN_WINDOW = {
    # added or semantics-changed in round 5
    "bloom_decontaminate",
    "bloom_user_filter",
    "events_distinct_sketch",
    "kmeans_arrow",
    "semdedup_arrow",
    "dedup_ngram_jaccard",
    "dedup_ngram_exact",
    "multimodal_decode",
    "supplier_pagerank_bucketed",
    "dedup_incremental",
    "knn_ivf_index",
    # last green row r03
    "freq_itemsets_by_lang",
    "transform_self",
    "mix_temperature",
    "knn_cosine",
    "events_pivot",
    "events_unpivot",
    "events_user_quartiles",
    "events_sessionize",
    "events_rolling",
    "events_daily_rollup",
    "events_asof_join",
    "events_windowed_counts",
    "events_interval_join",
    "events_hourly_cube",
    "events_json_props",
    "events_funnel",
    "events_retention",
    "events_top_users",
    "events_resample",
    "multimodal_features",
    "multimodal_frames",
    "nation_trade_volume",
    "product_line_revenue",
    "promo_revenue_share",
    "brand_discount_revenue",
    "pricing_summary",
    "customers_no_big_orders",
    "top_suppliers_per_nation",
    "order_priority_stats",
    "segment_part_overlap",
    "shipping_priority",
    "forecast_revenue",
    "returned_item_report",
    "large_orders",
    "nation_revenue_share",
    "small_qty_revenue",
    "customer_order_counts",
    "top_supplier",
    "idle_rich_customers",
}


def test_stale_and_new_entries_lead_the_registry():
    head = list(Q.QUERIES)[:WINDOW]
    missing = MUST_BE_IN_WINDOW - set(head)
    assert not missing, f"stale/new entries outside window: {sorted(missing)}"


def test_r04_green_trio_leads_r6_rotation():
    # Every canary slot ceded to round-5 entries (all three are
    # r04-green, so staleness stays ≤ 1 round without an r5 sample;
    # changed CC/pagerank defaults are pinned by bucketed-equality
    # differential tests). They must sit IMMEDIATELY past the window
    # so they lead the r6 rotation.
    order = list(Q.QUERIES)
    assert order[WINDOW : WINDOW + 3] == [
        "freq_itemsets_pfp",
        "dedup_clusters",
        "supplier_pagerank",
    ]


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
