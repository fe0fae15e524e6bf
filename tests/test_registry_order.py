"""Pin the driver-sampling order of the query registry.

The correctness harness samples ``queries()`` in insertion order with a
bounded per-round window (~50 rows). These tests guarantee that every
entry the driver has not yet hash-verified (round-1 failures whose fixes
landed in round 2, plus entries never sampled in rounds 1-2) sits inside
the first 50 keys, ahead of already-green regression canaries.
"""

from __future__ import annotations

import json
import pathlib

from optimal_parallel_fp_growth_spark import queries as Q

REPO = pathlib.Path(__file__).resolve().parents[1]

WINDOW = 50

# Entries with no green hash row in CORRECTNESS_r01/r02 (see VERDICT round 2).
MUST_BE_IN_WINDOW = {
    # r01 hash-fails, fixed in round 2, never driver-re-run
    "events_sessionize",
    "events_interval_join",
    "events_json_props",
    # never sampled
    "events_pivot",
    "events_unpivot",
    "events_user_quartiles",
    "events_funnel",
    "events_retention",
    "events_top_users",
    "events_resample",
    "supplier_pagerank",
    "nation_trade_volume",
    "product_line_revenue",
    "promo_revenue_share",
    "brand_discount_revenue",
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


def test_unverified_entries_lead_the_registry():
    head = list(Q.QUERIES)[:WINDOW]
    missing = MUST_BE_IN_WINDOW - set(head)
    assert not missing, f"driver-unverified entries outside window: {sorted(missing)}"
    # the three round-1 failures must be the very first rows
    assert head[:3] == ["events_sessionize", "events_interval_join", "events_json_props"]


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


def test_round2_correctness_rows_were_all_green():
    # guards against regressing an already-driver-confirmed entry silently:
    # if this file changes upstream, the canary tier should be revisited.
    rows = json.loads((REPO / "CORRECTNESS_r02.json").read_text())
    assert all(v.get("hash_match") for v in rows.values())
