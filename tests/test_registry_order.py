"""Pin the driver-sampling order of the query registry.

The correctness harness samples ``queries()`` in insertion order with a
bounded per-round window (exactly 50 rows in r4-r6). Round-7 rotation
contract (VERDICT r6 tasks #1/#2/#6):

* ``versioned_read`` (the r6 red row) leads, then every entry that has
  NEVER had a green driver row, then the twice-deferred r04-green set,
  then the untwinned r05-green entries — exactly filling the window.
* Entries pinned by a pytest differential to a twin (the ``TWINS`` map
  below) may defer past the 2-round staleness floor; everything else
  may not. This is the formalized twin policy: with 122 entries and a
  50-row window the untwinned rotation set must stay ≤ 2×WINDOW so no
  untwinned entry is ever more than 2 rounds stale.
* The staleness invariant is DATA-DRIVEN: we recompute each entry's
  last green round from the CORRECTNESS_r*.json files at test time, so
  forgetting to rotate the list next round fails this suite loudly.
"""

from __future__ import annotations

import json
import pathlib

from optimal_parallel_fp_growth_spark import queries as Q

REPO = pathlib.Path(__file__).resolve().parents[1]

WINDOW = 50

# entry -> (twin entry, pytest differential that pins them together).
# A twinned entry may skip rotation while its twin (or the chain it
# heads) holds a fresher/in-window driver row; the test names are real
# collected tests so a rename breaks this file.
TWINS: dict[str, tuple[str, str]] = {
    "kmeans_arrow": (
        "kmeans_clusters",
        "test_clustering.py::test_arrow_assignment_matches_sql",
    ),
    "semdedup_arrow": (
        "semdedup",
        "test_clustering.py::test_semdedup_arrow_matches_sql",
    ),
    "knn_ivf_index": (
        "knn_ivf",
        "test_similarity.py::test_ann_against_index_matches_ivf_topk",
    ),
    "knn_cosine": (
        "knn_ann",
        "test_similarity.py::test_ann_cosines_agree_with_exact",
    ),
    "supplier_pagerank_bucketed": (
        "supplier_pagerank",
        "test_graph.py::test_pagerank_bucketed_edges_matches_default",
    ),
    "dedup_incremental": (
        "dedup_minhash_lsh",
        "test_incremental_dedup.py::test_incremental_matches_full_lsh_cut",
    ),
    "transform_self": (
        "transform",
        "test_advice_round2.py::test_transform_self_matches_manual",
    ),
    "dedup_ngram_exact": (
        "dedup_ngram_prefix",
        "test_ngram_prefix.py::test_matches_exact_tier_on_fixture_corpus",
    ),
    "dedup_ngram_jaccard": (
        "dedup_ngram_exact",  # chain: jaccard ↔ exact ↔ prefix (r6 green)
        "test_dedup_scale_path.py::test_default_max_df_is_auto_and_exact_at_small_scale",
    ),
    "freq_itemsets_by_lang": (
        "freq_itemsets",
        "test_pfp_kernel.py::test_grouped_mining_matches_per_corpus_runs",
    ),
    "bloom_decontaminate": (
        "decontaminate",
        "test_bloom.py::test_anti_join_exact",
    ),
    "bloom_user_filter": (
        "decontaminate",
        "test_bloom.py::test_semi_join_exact",
    ),
    "events_distinct_sketch": (
        "events_windowed_counts",
        "test_streaming.py::test_windowed_distinct_sketch_matches_exact_batch",
    ),
    "multimodal_decode": (
        "multimodal_pixels",
        "test_multimodal.py::test_attach_decode_media_matches_recipe",
    ),
    "multimodal_features": (
        "multimodal_decode",
        "test_multimodal.py::test_extract_features_matches_recipe",
    ),
    "mix_temperature": (
        "mix_sources",
        "test_curation_ops.py::test_mix_temperature_matches_reference",
    ),
    "events_pivot": (
        "events_hourly_cube",  # same conditional-agg kernel, both plans compared
        "test_pivot.py::test_conditional_agg_equals_dataframe_pivot",
    ),
    "events_unpivot": (
        "events_pivot",
        "test_pivot.py::test_pivot_unpivot_roundtrip",
    ),
    "events_sessionize": (
        "events_hopping",
        "test_streaming.py::test_session_window_counts_match_batch_sessionize",
    ),
    "events_windowed_counts": (
        "events_hopping",
        "test_streaming.py::test_windowed_counts_match_batch",
    ),
    "events_interval_join": (
        "events_hopping",
        "test_streaming.py::test_correlate_streams_matches_batch_interval_join",
    ),
    "events_funnel": (
        "events_hopping",
        "test_stateful_streaming.py::test_funnel_progress_matches_batch",
    ),
    "events_resample": (
        "events_rolling",
        "test_resample.py::test_hand_values",
    ),
}


# entries created after this round's window filled: exempt from the
# staleness invariant until their first driver sample, which MUST lead
# the NEXT round's window (move them to the head and empty this set
# when rotating for r8).
NEW_THIS_ROUND: set[str] = {"html_extract", "lm_perplexity"}


def _last_green_by_entry() -> tuple[dict[str, int], int]:
    """(entry -> last round with a fully-green driver row, current round)."""
    last: dict[str, int] = {}
    rounds = sorted(
        int(p.stem.split("_r")[1]) for p in REPO.glob("CORRECTNESS_r*.json")
    )
    for r in rounds:
        rows = json.loads((REPO / f"CORRECTNESS_r{r:02d}.json").read_text())
        for name, v in rows.items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match", True)
            ):
                last[name] = r
    return last, (rounds[-1] + 1 if rounds else 1)


def test_twins_reference_real_tests():
    here = pathlib.Path(__file__).parent
    for entry, (twin, testref) in TWINS.items():
        assert entry in Q.QUERIES, entry
        assert twin in Q.QUERIES, twin
        fname, tname = testref.split("::")
        src = (here / fname).read_text()
        assert f"def {tname.split('[')[0]}(" in src, (
            f"{entry}: pinning test {testref} not found"
        )


def test_untwinned_rotation_set_fits_two_windows():
    # NEW_THIS_ROUND entries are exempt until their first sample (they
    # lead the next window by construction); once they're in rotation
    # they count, so every addition eventually demands either a twin
    # differential somewhere or a bigger window — this test is the
    # early-warning that forces that conversation before staleness
    # actually slips.
    untwinned = [
        k for k in Q.QUERIES if k not in TWINS and k not in NEW_THIS_ROUND
    ]
    assert len(untwinned) <= 2 * WINDOW, (
        f"{len(untwinned)} untwinned entries > {2 * WINDOW}: some entry "
        "would exceed 2-round staleness — add a twin differential or "
        "negotiate a bigger driver window"
    )


def test_window_covers_every_stale_untwinned_entry():
    """The data-driven rotation invariant. Never-green entries and any
    untwinned entry whose last green row is ≥2 rounds old MUST be in
    the first WINDOW positions; twinned entries get a 4-round cap so
    they still rotate eventually."""
    last, current = _last_green_by_entry()
    head = set(list(Q.QUERIES)[:WINDOW])
    violations = []
    for name in Q.QUERIES:
        if name in head:
            continue
        staleness = current - last.get(name, 0)
        if name in NEW_THIS_ROUND:
            continue  # added after the window filled; must lead next round
        if name not in last:
            violations.append(f"{name}: never driver-green, outside window")
        elif name in TWINS:
            if staleness > 4:
                violations.append(
                    f"{name}: twinned but {staleness} rounds stale (cap 4)"
                )
        elif staleness > 2:
            violations.append(f"{name}: untwinned, {staleness} rounds stale")
    assert not violations, "\n".join(violations)


def test_window_leads_with_versioned_read():
    # VERDICT r6 task #1: the one red r6 row must be re-sampled first.
    assert next(iter(Q.QUERIES)) == "versioned_read"


def test_r7_window_composition():
    """Pin the exact tiers so a mid-round insertion can't silently push
    a stale entry out of the window."""
    order = list(Q.QUERIES)
    tier1 = [
        "versioned_read",
        "versioned_merge",
        "min_cost_part_supplier",
        "important_parts",
        "returnflag_priority_lines",
        "supplier_variety",
        "recent_concentration_suppliers",
        "multimodal_audio",
        "multimodal_jpeg",
        "repeated_spans",
        "zorder_layout_read",
        "local_supplier_revenue",
    ]
    tier2 = [
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
    assert order[: len(tier1)] == tier1
    assert order[len(tier1) : len(tier1) + len(tier2)] == tier2
    # tier 3 fills the window with untwinned r05-green entries only
    tier3 = order[len(tier1) + len(tier2) : WINDOW]
    assert all(name not in TWINS for name in tier3), tier3
    # new-this-round entries sit at the very tail
    assert set(order[len(order) - len(NEW_THIS_ROUND):]) == NEW_THIS_ROUND
    # and the deferred tier-4 block is exactly the twinned r05 set
    last, _ = _last_green_by_entry()
    deferred = order[WINDOW : WINDOW + 23]
    assert all(last.get(n) == 5 for n in deferred), deferred
    assert all(n in TWINS for n in deferred), [
        n for n in deferred if n not in TWINS
    ]


def test_queries_and_oracles_share_order_and_keys():
    assert list(Q.QUERIES) == list(Q.ORACLES)


def test_priority_names_all_resolve():
    # a typo in _DRIVER_PRIORITY would silently drop the entry to the tail
    unknown = [k for k in Q._DRIVER_PRIORITY if k not in Q.QUERIES]
    assert not unknown, f"_DRIVER_PRIORITY names not in registry: {unknown}"
    assert list(Q.QUERIES) == Q._DRIVER_PRIORITY


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
    # r06's one red row (versioned_read, hash-only; judge-exonerated and
    # re-led in r7) is the documented exception.
    for r in ("r02", "r03", "r04", "r05", "r06"):
        rows = json.loads((REPO / f"CORRECTNESS_{r}.json").read_text())
        red = [k for k, v in rows.items() if not v.get("hash_match")]
        assert red == ([] if r != "r06" else ["versioned_read"]), (r, red)


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
