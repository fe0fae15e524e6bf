"""Pin the driver-sampling order of the query registry.

The correctness harness samples ``queries()`` in insertion order with a
bounded per-round window (exactly 50 rows since r4). Round-13 rotation
contract:

* The three mid-r12 additions (``index_search`` /
  ``versioned_stream_follow`` / ``clustered_table_read``, never
  driver-sampled — their NEW_THIS_ROUND exemption expired at the r12
  snapshot) lead, then the 11 unpinned r10-green entries deferred
  through r12 (staleness 3 — named verbatim in the r12 tripwire
  output), then ALL 26 pinned r10-green (cap 4: due r13/r14 —
  sampling them all now, incl. ``multimodal_decode``, zeroes the r14
  debt from that tier), then 10 of the 43 unpinned r11-green —
  exactly filling the window. The remaining 33 unpinned r11-green
  MUST lead the r14 window; the 7 pinned r11-green are due r14/r15
  and all fit r14's 17 post-lead slots.
* A pinned entry (entry-twin differential in ``TWINS``, or an
  independent-recomputation ground truth in ``GROUND_TRUTH_PINS``) may
  defer to a 4-round staleness cap; everything else holds the 2-round
  floor.
* The staleness invariant is DATA-DRIVEN: each entry's last green round
  is recomputed from the CORRECTNESS_r*.json files at test time, so
  forgetting to rotate the list next round fails this suite loudly —
  exactly what caught the skipped r8 rotation.
* Steady-state capacity (the re-derivation VERDICT r8 task #2 asked
  for): an untwinned entry needs a window slot every 3 rounds (sampled
  at N, staleness 1/2 at N+1/N+2 heads, must re-enter at N+3); a
  pinned entry every 5. With U untwinned and P pinned entries the
  per-round slot demand is U/3 + P/5, which must stay ≤ WINDOW —
  asserted below, replacing the old (insufficient) ``U ≤ 2·WINDOW``
  bound.
"""

from __future__ import annotations

import json
import pathlib

from optimal_parallel_fp_growth_spark import queries as Q

REPO = pathlib.Path(__file__).resolve().parents[1]

WINDOW = 50

# entry -> (twin entry, pytest differential that pins them together).
# A pinned entry may skip rotation up to the 4-round cap while its twin
# (or the chain it heads) holds a fresher/in-window driver row; the
# test names are real collected tests so a rename breaks this file.
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
        "dedup_ngram_exact",  # chain: jaccard ↔ exact ↔ prefix
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
    # --- added round 9 (VERDICT r8 task #2: pin the rotation residue) ---
    "freq_itemsets_pfp": (
        "freq_itemsets",
        "test_pfp_kernel.py::test_kernels_agree_on_lineitem",
    ),
    "assoc_rules": (
        "freq_itemsets",  # rules derived from the same fitted itemsets
        "test_mllib_rules_crosscheck.py::test_rules_match_mllib_events",
    ),
    "transform": (
        "transform_self",
        "test_advice_round2.py::test_transform_self_matches_manual",
    ),
    "dedup_ngram_prefix": (
        "dedup_ngram_exact",  # the same differential pins both sides
        "test_ngram_prefix.py::test_matches_exact_tier_on_fixture_corpus",
    ),
    "dedup_clusters": (
        "dedup_minhash_lsh",  # clusters == union-find over the lsh pairs
        "test_cc_sampling.py::test_dedup_clusters_matches_union_find",
    ),
    "deduped_corpus": (
        "deduped_corpus_cc",  # greedy vs cc policy related + cc vs union-find
        "test_cc_sampling.py::test_deduped_corpus_cc_policy",
    ),
    "decontaminate": (
        "bloom_decontaminate",  # exact anti-join == bloom+verify
        "test_bloom.py::test_anti_join_exact",
    ),
    "mix_sources": (
        "mix_temperature",
        "test_curation_ops.py::test_mix_temperature_matches_reference",
    ),
    "knn_hyperplane": (
        "knn_cosine",  # surfaced pairs score identical cosines
        "test_similarity.py::test_hyperplane_cosines_agree_with_exact",
    ),
    # --- added round 11 (the Zipf skew-stress entry, VERDICT r10 #7) ---
    "dedup_zipf_prefix": (
        "dedup_ngram_exact",  # same pair contract, exact tier recompute
        "test_zipf_skew.py::test_matches_exact_tier_on_zipf_corpus",
    ),
}

# entry -> pytest test that recomputes the entry's semantics
# INDEPENDENTLY (pure python / numpy / hashlib brute force, or
# hand-pinned values on crafted input). Same 4-round cap as TWINS —
# a ground-truth differential is at least as strong as an entry twin.
# Policy: a pin here must be a full-semantics recomputation, never a
# shape/smoke test.
GROUND_TRUTH_PINS: dict[str, str] = {
    "random_projection": (
        "test_random_projection.py::test_matches_numpy_ground_truth"
    ),
    "ngram_counts": (
        "test_property_ngrams.py::test_ngram_counts_match_brute_force"
    ),
    "inverted_index": (
        "test_property_ngrams.py::test_inverted_index_matches_brute_force"
    ),
    "quality_classifier": (
        "test_classifier.py::test_score_matches_hand_computation"
    ),
    "tfidf_top_terms": "test_packing.py::test_tfidf_hand_values",
    "dedup_lines": "test_linededup.py::test_remove_repeated_lines",
    "stratified_sample": (
        "test_curation_ops.py::test_stratified_sample_exact_counts_and_small_strata"
    ),
    "weighted_sample": (
        "test_curation_ops.py::test_weighted_sample_counts_determinism_and_bias"
    ),
    # dq_documents/dq_events are thin declarative constraint lists over
    # the SAME check_suite kernel, hand-value-pinned on dirty data
    "dq_documents": "test_quality_checks.py::test_dirty_data_verdicts",
    "dq_events": "test_quality_checks.py::test_dirty_data_verdicts",
    "quality_score": "test_rotation_pins.py::test_quality_score_hand_values",
    "text_stats": "test_rotation_pins.py::test_text_stats_hand_values",
    "token_quantiles": (
        "test_rotation_pins.py::test_token_quantiles_match_numpy_brute_force"
    ),
    "dedup_exact": (
        "test_rotation_pins.py::test_dedup_exact_matches_brute_force"
    ),
    "embedding_neardup": (
        "test_rotation_pins.py::test_embedding_neardup_cosines_exact_and_recall"
    ),
    # round-9 mid-round addition: the recipe's closed forms re-derived
    # by DuckDB over every residue class, plus numpy brute force for
    # the codec pair (test_video.py)
    "multimodal_video": (
        "test_video.py::test_recipe_matches_duckdb_closed_forms"
    ),
    # round-10 mid-round addition: the option-matrix recipe re-derived
    # by DuckDB over every residue class, plus the feature-matrix RGB
    # replay for the codec itself (test_video.py)
    "multimodal_gif": (
        "test_video.py::test_gif_entry_matches_duckdb_closed_forms"
    ),
    # round-11 mid-round addition: the salted two-phase aggregation
    # recomputed by Spark's PLAIN (unsalted) groupBy over the same
    # exploded tokens — an independent full-semantics recomputation
    "skewed_token_counts": (
        "test_zipf_skew.py::test_salted_counts_match_plain_groupby"
    ),
    "skewed_doc_hotness": (
        "test_zipf_skew.py::test_salted_join_matches_plain_join"
    ),
    "hive_layout_read": (
        "test_sources_sinks.py::test_hive_layout_entry_matches_direct"
    ),
    "compacted_layout_read": (
        "test_sources_sinks.py::test_compacted_layout_entry_matches_direct"
    ),
    "versioned_changes": (
        "test_versioned.py::test_table_changes_matches_full_snapshot_diff"
    ),
    # round-11 mid-round addition: the rolled-forward state recomputed
    # by a pure-python rollup of the target snapshot for every version
    # pair (incl. group birth/death and all-NULL-measure groups)
    "incremental_agg": (
        "test_versioned.py::test_refresh_aggregate_matches_full_recompute"
    ),
    # round-11 mid-round addition: create → mutate → sync → read_view
    # recomputed by the same pure-python snapshot rollup, plus the
    # watermark / no-op-sync / time-travel contracts
    "materialized_view": (
        "test_versioned.py::test_materialized_view_lifecycle"
    ),
    # round-11 mid-round addition: sync landed on the python
    # re-tokenization of the head snapshot across swap/insert/delete/
    # append, plus delta-minimality and churn-watermark contracts
    "incremental_index": (
        "test_text_index.py::test_sync_matches_brute_postings_at_every_stop"
    ),
    # round-11 mid-round addition: full MOR semantics hand-pinned on
    # crafted input (zero-rewrite commit, mask visibility, time
    # travel, and the sequence rule for re-inserted keys), plus the
    # all-version-pairs brute CDF diff over a mixed COW/MOR lifecycle
    "mor_delete_read": (
        "test_versioned.py::test_mor_delete_basics_and_sequence_rule"
    ),
    # round-12 mid-round addition: hand-pinned lookups on a crafted
    # 200-doc corpus (exact hit sets + prune-really-bites file counts),
    # plus the wide-sync clustering differential
    "index_search": (
        "test_text_index.py::test_search_prunes_to_covering_files"
    ),
    # round-12 mid-round addition: replica-equals-base at every stop
    # of a COW/MOR/restore lifecycle, recomputed from read_table
    # snapshots (plus retry-idempotency and fresh-seed contracts)
    "versioned_stream_follow": (
        "test_versioned.py::test_stream_follow_builds_replica_across_full_lifecycle"
    ),
    # round-12 mid-round addition: pruning survival across no-param
    # merge / compaction / overwrite / clone, hand-pinned values
    "clustered_table_read": (
        "test_versioned.py::test_recorded_cluster_spec_survives_every_rewrite"
    ),
    # round-13 mid-round additions — each pinned to a full-semantics
    # recomputation (per-row expected values or python brute force on
    # crafted input), per the GT-pin policy above
    "versioned_update": (
        "test_versioned_update.py::test_update_basic_and_oracle"
    ),
    "stats_pushdown": (
        "test_versioned_update.py::test_minmax_from_manifest_matches_scan"
    ),
    "versioned_range_read": (
        "test_versioned_update.py::test_range_prune_cuts_both_sides"
    ),
    "zorder_table_read": (
        "test_zorder_table.py::test_zorder_spec_prunes_both_dimensions"
    ),
    "pii_redact": "test_packing.py::test_pii_stats_and_redaction",
    "bucketed_table_merge": (
        "test_bucketed_table.py::test_merge_rewrites_only_changeset_buckets"
    ),
    "normalize_text": (
        "test_normalize_text.py::test_hostile_inputs_match_brute"
    ),
    "merge_update_cols": (
        "test_versioned_update.py::test_merge_update_cols_partial_update"
    ),
}


# entries created after a round's window filled: entry -> the round it
# was added in. Exempt from the staleness invariant ONLY while
# ``current_round <= added_round`` (the window they could first lead is
# the NEXT round's); the moment a CORRECTNESS file postdates the
# addition the exemption EXPIRES and the entry must be in the window or
# have a row — closing the loophole that let r8 skip html_extract/
# lm_perplexity silently (VERDICT r8 task #3).
NEW_THIS_ROUND: dict[str, int] = {
    # (r12's three additions rotated into the r13 window lead — their
    # exemption is spent; r13 mid-round additions land here)
    "versioned_update": 13,
    "stats_pushdown": 13,
    "versioned_range_read": 13,
    "zorder_table_read": 13,
    "pii_redact": 13,
    "bucketed_table_merge": 13,
    "normalize_text": 13,
    "merge_update_cols": 13,
}


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


def _staleness_violations(
    order: list[str],
    last: dict[str, int],
    current: int,
    pinned: set[str],
    new_this_round: dict[str, int],
) -> list[str]:
    """The rotation invariant as a pure function (unit-testable against
    synthetic histories): never-sampled entries and any unpinned entry
    ≥3 rounds stale MUST be in the first WINDOW positions; pinned
    entries get a 4-round cap so they still rotate eventually."""
    head = set(order[:WINDOW])
    violations = []
    for name in order:
        if name in head:
            continue
        if name in new_this_round and current <= new_this_round[name]:
            continue  # window was contractually full when it was added
        staleness = current - last.get(name, 0)
        if name not in last:
            violations.append(f"{name}: never driver-green, outside window")
        elif name in pinned:
            if staleness > 4:
                violations.append(
                    f"{name}: pinned but {staleness} rounds stale (cap 4)"
                )
        elif staleness > 2:
            violations.append(f"{name}: unpinned, {staleness} rounds stale")
    return violations


def _pinned() -> set[str]:
    return set(TWINS) | set(GROUND_TRUTH_PINS)


def test_twins_reference_real_tests():
    here = pathlib.Path(__file__).parent
    refs = [(e, t) for e, (_, t) in TWINS.items()]
    refs += list(GROUND_TRUTH_PINS.items())
    for entry, testref in refs:
        assert entry in Q.QUERIES, entry
        fname, tname = testref.split("::")
        src = (here / fname).read_text()
        assert f"def {tname.split('[')[0]}(" in src, (
            f"{entry}: pinning test {testref} not found"
        )
    for entry, (twin, _) in TWINS.items():
        assert twin in Q.QUERIES, twin


def test_rotation_capacity_is_sustainable():
    """Steady-state slot demand must fit the window (see module
    docstring for the derivation): U/3 + P/5 ≤ WINDOW. This replaces
    the old U ≤ 2·WINDOW bound, which ignored the pinned entries' own
    cap-4 rotation demand."""
    pinned = _pinned()
    u = len([k for k in Q.QUERIES if k not in pinned])
    p = len(pinned)
    assert u / 3 + p / 5 <= WINDOW, (
        f"registry outgrew the window: {u} unpinned + {p} pinned need "
        f"{u / 3 + p / 5:.1f} slots/round > {WINDOW} — add pins or "
        "negotiate a bigger driver window"
    )


def test_window_covers_every_stale_unpinned_entry():
    last, current = _last_green_by_entry()
    violations = _staleness_violations(
        list(Q.QUERIES), last, current, _pinned(), NEW_THIS_ROUND
    )
    assert not violations, "\n".join(violations)


def test_new_this_round_exemption_expires():
    """The loophole that let round 8 skip html_extract/lm_perplexity:
    the old exemption never expired, so a never-sampled entry outside
    the window stayed legal forever. Reproduce the r8 head state
    synthetically and require the invariant to FAIL there."""
    order = ["fresh_entry"] * 0 + [f"e{i}" for i in range(WINDOW)] + ["late_add"]
    last = {f"e{i}": 7 for i in range(WINDOW)}
    # added mid-round 7; at the r7 head (current == 7) it is exempt...
    ok = _staleness_violations(order, last, 7, set(), {"late_add": 7})
    assert not ok
    # ...but at the r8 head (current == 8, a CORRECTNESS file postdates
    # the addition) the exemption has expired: outside window + no row
    # MUST violate — this is exactly the state r8 shipped in.
    bad = _staleness_violations(order, last, 8, set(), {"late_add": 7})
    assert bad == ["late_add: never driver-green, outside window"]
    # and a driver row clears it, exemption or not
    last["late_add"] = 8
    assert not _staleness_violations(order, last, 9, set(), {"late_add": 7})


def test_simulated_r14_rotation_is_feasible():
    """Rotation-debt solvency check, re-pinned each round: the
    invariant must provably hold through a simulated r14 with no new
    rows beyond the r13 window. Simulate: every entry in the CURRENT
    head-50 goes green in r13, the r14 builder rotates greedily
    (most-stale first, pinned entries after unpinned at equal
    staleness), and the invariant is evaluated at the r14 head."""
    order = list(Q.QUERIES)
    last, current = _last_green_by_entry()
    assert current == 13  # this simulation is written against the r13 head
    sim_last = dict(last)
    for name in order[:WINDOW]:
        sim_last[name] = 13
    pinned = _pinned()
    r14_order = sorted(
        order,
        key=lambda n: (
            sim_last.get(n, -1),  # most stale first; never-sampled lead
            n in pinned,  # unpinned before pinned at equal staleness
        ),
    )
    violations = _staleness_violations(r14_order, sim_last, 14, pinned, {})
    assert not violations, "\n".join(violations)


def test_window_leads_with_never_sampled_entries():
    # the three mid-r12 additions with no driver row ever lead the r13
    # window.
    order = list(Q.QUERIES)
    assert order[:3] == [
        "index_search", "versioned_stream_follow", "clustered_table_read",
    ]


def test_r13_window_composition():
    """Pin the exact tiers so a mid-round insertion can't silently push
    a stale entry out of the window."""
    order = list(Q.QUERIES)
    last, _ = _last_green_by_entry()
    pinned = _pinned()
    # tier 1: never driver-sampled (the three mid-r12 additions)
    tier1 = [
        "index_search", "versioned_stream_follow", "clustered_table_read",
    ]
    assert order[: len(tier1)] == tier1
    # tier 2: the 11 unpinned r10-green deferred through r12
    tier2 = order[len(tier1) : len(tier1) + 11]
    assert all(last.get(n) == 10 and n not in pinned for n in tier2), tier2
    # tier 3: ALL 26 pinned r10-green (cap 4, due r13/r14 — zeroing
    # the r14 debt from this tier; multimodal_decode included)
    tier3 = order[len(tier1) + 11 : len(tier1) + 37]
    assert all(last.get(n) == 10 and n in pinned for n in tier3), tier3
    assert "multimodal_decode" in tier3
    # tier 4 fills the window: 10 unpinned r11-green
    tier4 = order[len(tier1) + 37 : WINDOW]
    assert all(last.get(n) == 11 and n not in pinned for n in tier4), tier4
    # tier 5: the 33 deferred unpinned r11-green — MUST lead r14
    tier5 = order[WINDOW : WINDOW + 33]
    assert all(last.get(n) == 11 and n not in pinned for n in tier5), tier5
    # tier 6: the 7 pinned r11-green (cap 4: due r14/r15)
    tier6 = order[WINDOW + 33 : WINDOW + 40]
    assert all(last.get(n) == 11 and n in pinned for n in tier6), tier6
    # tier 7: the r12-green tail (freshest last), then any mid-round
    # additions at the very end
    tail = order[WINDOW + 40 :]
    tier7 = [n for n in tail if n not in NEW_THIS_ROUND]
    assert all(last.get(n) == 12 for n in tier7), [
        n for n in tier7 if last.get(n) != 12
    ]
    assert set(tail[len(tier7) :]) == set(NEW_THIS_ROUND)


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
    # Documented exceptions: r06's one red row (versioned_read, hash-only;
    # judge-exonerated, re-led r7) and r07's three HUGEINT oracle-cast
    # mismatches (root-caused r7, fixed r8, all green in r08).
    known_red = {
        "r06": ["versioned_read"],
        "r07": ["returnflag_priority_lines", "versioned_merge", "versioned_read"],
    }
    for r in (
        "r02", "r03", "r04", "r05", "r06", "r07", "r08", "r09", "r10", "r11",
        "r12",
    ):
        rows = json.loads((REPO / f"CORRECTNESS_{r}.json").read_text())
        red = sorted(k for k, v in rows.items() if not v.get("hash_match"))
        assert red == known_red.get(r, []), (r, red)


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
