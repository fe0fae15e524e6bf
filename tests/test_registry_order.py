"""Pin the driver-sampling order of the query registry.

The correctness harness samples ``queries()`` in insertion order with a
bounded per-round window (exactly 50 rows since r4). Round-16 rotation
contract:

* The four mid-r15 additions (``versioned_stream_ingest`` /
  ``spec_evolved_read`` / ``dedup_spans`` / ``bloom_table_read``,
  never driver-sampled — their NEW_THIS_ROUND exemption expired at the
  r15 snapshot) lead, then the 2 pinned r13-green (staleness 3 —
  cap-4 debt zeroed), then the 15 pinned r14-green, then the 14 pinned
  r15-green. The r15 pin-throughput batches made the whole doc/vector/
  event/lifecycle tier retirement-eligible once CORRECTNESS_r15
  landed: 50 entries retired at this rotation (75 → 125), leaving 35
  active entries — ALL pinned — so the entire active registry fits in
  one window with 15 slots of slack for mid-r16 additions.
* A pinned entry (entry-twin differential in ``TWINS``, or an
  independent-recomputation ground truth in ``GROUND_TRUTH_PINS``) may
  defer to a 4-round staleness cap; everything else holds the 2-round
  floor.
* RETIREMENT (new in r14 — VERDICT r13 task #2): the registry hit 148
  entries and the 50-slot window could no longer absorb steady demand
  plus the pinned tier's lumpy cap-4 debt (an EDF simulation goes
  infeasible at r18 with no retirement). An entry RETIRES from driver
  rotation when it is BOTH pinned AND driver-validated green in ≥3
  distinct rounds — ``Q.RETIRED_TO_PYTEST`` is the explicit list, the
  criteria are asserted data-driven below, and retired entries KEEP
  their queries()/oracle_sql() registration so the judge's full sweep
  still covers them. They sit at the tail of the sampling order and
  are exempt from the staleness invariant; their correctness is
  carried by their pytest pins (run every suite) plus their ≥3
  historical driver rows.
* The staleness invariant is DATA-DRIVEN: each entry's last green round
  is recomputed from the CORRECTNESS_r*.json files at test time, so
  forgetting to rotate the list next round fails this suite loudly —
  exactly what caught the skipped r8 rotation.
* Capacity is proven by SIMULATION, not just a steady-state bound: the
  EDF scheduler below replays the real history forward with 8 pinned
  additions per round and the retirement pipeline, and must stay
  feasible through r23 (three rounds beyond the r20 build horizon;
  sustained 8/round growth saturates the 50-slot window at r25 — see
  test_rotation_capacity_is_sustainable for the arithmetic).
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
    "versioned_date_bloom_read": (
        "test_r17_lakehouse.py::test_versioned_date_bloom_read_matches_python"
    ),
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
    # round-14 mid-round addition: the two-predicate lookup's rows
    # recomputed by a closed-form python comprehension, slice
    # disjointness asserted file-by-file from the manifest
    "bucketed_sorted_read": (
        "test_bucketed_table.py::test_sorted_buckets_two_predicate_lookup"
    ),
    "events_first_touch": (
        "test_first_touch.py::test_first_touch_matches_brute_force"
    ),
    "events_quantile_sketch": (
        "test_sketches.py::test_percentile_sketch_exact_regime_and_envelope"
    ),
    "heavy_hitters_tokens": (
        "test_sketches.py::test_heavy_hitters_matches_brute_force"
    ),
    "purge_deletes": (
        "test_purge_compact.py::test_purge_materializes_masks_and_restores_metadata_answers"
    ),
    "partial_compact": (
        "test_purge_compact.py::test_compact_where_folds_only_the_selected_range"
    ),
    "schema_evolution_read": (
        "test_schema_evolution.py::test_rename_reads_both_eras_and_time_travels"
    ),
    "embedding_quantize": (
        "test_similarity.py::test_quantize_embeddings_matches_numpy"
    ),
    # round-15 mid-round addition: the ingested table's full contents
    # landed on the batch input row-for-row through a real stream,
    # plus the crash/full-replay and duplicated-epoch contracts in the
    # same suite
    "versioned_stream_ingest": (
        "test_stream_ingest.py::"
        "test_stream_ingest_agrees_with_batch_and_versions_per_batch"
    ),
    # round-15 mid-round addition: per-era pruning recomputed from
    # manifest math (bucket_of under each era's spec) with lossless
    # probe reads, plus metadata-only/migration/clone contracts in the
    # same suite
    "spec_evolved_read": (
        "test_spec_evolution.py::test_each_era_prunes_by_its_own_spec"
    ),
    # round-15 pin-throughput batch: the eight remaining unpinned
    # relational entries (TPC-H Q2/Q5/Q11/Q12/Q16/Q17/Q19/Q20 shapes)
    # recomputed in pure python — exact DECIMAL arithmetic where the
    # entries use it — over the collected sf0.001 tables
    "brand_discount_revenue": (
        "test_relational_pins2.py::"
        "test_brand_discount_revenue_matches_python"
    ),
    "small_qty_revenue": (
        "test_relational_pins2.py::test_small_qty_revenue_matches_python"
    ),
    "returnflag_priority_lines": (
        "test_relational_pins2.py::"
        "test_returnflag_priority_lines_matches_python"
    ),
    "supplier_variety": (
        "test_relational_pins2.py::test_supplier_variety_matches_python"
    ),
    "recent_concentration_suppliers": (
        "test_relational_pins2.py::"
        "test_recent_concentration_suppliers_matches_python"
    ),
    "local_supplier_revenue": (
        "test_relational_pins2.py::"
        "test_local_supplier_revenue_matches_python"
    ),
    "min_cost_part_supplier": (
        "test_relational_pins2.py::"
        "test_min_cost_part_supplier_matches_python"
    ),
    "important_parts": (
        "test_relational_pins2.py::test_important_parts_matches_python"
    ),
    # round-15 pin-throughput batch 2: the seven unpinned event-
    # analytics entries recomputed in pure python (exact ints,
    # math.fsum floats) over the collected sf0.001 events table
    "events_rolling": (
        "test_events_pins.py::test_events_rolling_matches_python"
    ),
    "events_daily_rollup": (
        "test_events_pins.py::test_events_daily_rollup_matches_python"
    ),
    "events_hourly_cube": (
        "test_events_pins.py::test_events_hourly_cube_matches_python"
    ),
    "events_asof_join": (
        "test_events_pins.py::test_events_asof_join_matches_python"
    ),
    "events_json_props": (
        "test_events_pins.py::test_events_json_props_matches_python"
    ),
    "events_retention": (
        "test_events_pins.py::test_events_retention_matches_python"
    ),
    "events_hopping": (
        "test_events_pins.py::test_events_hopping_matches_python"
    ),
    # round-15 pin-throughput batch 3: ten doc-pipeline entries
    # recomputed in pure python (hashlib, python re, exact integer
    # arithmetic) over the collected sf0.001 documents table; pii adds
    # a crafted-input hand-count leg (the fixture corpus is PII-free)
    "doc_fingerprint": (
        "test_docops_pins.py::test_doc_fingerprint_matches_python"
    ),
    "pii_stats": "test_docops_pins.py::test_pii_stats_matches_python",
    "chunk_documents": (
        "test_docops_pins.py::test_chunk_documents_matches_python"
    ),
    "pack_sequences": (
        "test_docops_pins.py::test_pack_sequences_matches_python"
    ),
    "corpus_split": (
        "test_docops_pins.py::test_corpus_split_matches_python"
    ),
    "repetition_signals": (
        "test_docops_pins.py::test_repetition_signals_matches_python"
    ),
    "source_ngram_overlap": (
        "test_docops_pins.py::test_source_ngram_overlap_matches_python"
    ),
    "repeated_spans": (
        "test_docops_pins.py::test_repeated_spans_matches_python"
    ),
    "lang_id": "test_docops_pins.py::test_lang_id_matches_python",
    "gopher_rules": (
        "test_docops_pins.py::test_gopher_rules_matches_python"
    ),
    # round-15 pin-throughput batch 4: nine vector/sampling entries
    # recomputed in pure python over the collected sf0.001 tables —
    # the engine's exact left-to-right double fold for every dot
    # product and decimal-HALF_UP rounding, so buckets, cells, ranks
    # and tiebreaks match bit-for-bit
    "label_centroids": (
        "test_vector_pins.py::test_label_centroids_matches_python"
    ),
    "kmeans_clusters": (
        "test_vector_pins.py::test_kmeans_clusters_matches_python"
    ),
    "kmeans_auto": (
        "test_vector_pins.py::test_kmeans_auto_matches_python"
    ),
    "semdedup": "test_vector_pins.py::test_semdedup_matches_python",
    "semdedup_auto": (
        "test_vector_pins.py::test_semdedup_auto_matches_python"
    ),
    "knn_ann": "test_vector_pins.py::test_knn_ann_matches_python",
    "knn_ivf": "test_vector_pins.py::test_knn_ivf_matches_python",
    "hard_negatives": (
        "test_vector_pins.py::test_hard_negatives_matches_python"
    ),
    "negative_pairs": (
        "test_vector_pins.py::test_negative_pairs_matches_python"
    ),
    # round-15 pin-throughput batch 5: dedup/graph/mining entries —
    # hashlib minhash + simhash recomputes, union-find CC, pure-python
    # power iteration, Apriori brute-force lattice
    "dedup_minhash_lsh": (
        "test_dedup_graph_pins.py::test_dedup_minhash_lsh_matches_python"
    ),
    "deduped_corpus_cc": (
        "test_dedup_graph_pins.py::test_deduped_corpus_cc_matches_python"
    ),
    "dedup_simhash": (
        "test_dedup_graph_pins.py::test_dedup_simhash_matches_python"
    ),
    "supplier_pagerank": (
        "test_dedup_graph_pins.py::test_supplier_pagerank_matches_python"
    ),
    "freq_itemsets_docs": (
        "test_dedup_graph_pins.py::test_freq_itemsets_docs_matches_python"
    ),
    # round-15 pin-throughput batch 6: lifecycle/pipeline entries —
    # closed-form final states recomputed in pure python (exact
    # DECIMAL sums, hashlib split buckets, add-alpha bigram LM, the
    # full greedy-dedup → quality → split → pack curation chain)
    "versioned_read": (
        "test_lifecycle_pins.py::test_versioned_read_matches_python"
    ),
    "versioned_merge": (
        "test_lifecycle_pins.py::test_versioned_merge_matches_python"
    ),
    "zorder_layout_read": (
        "test_lifecycle_pins.py::test_zorder_layout_read_matches_python"
    ),
    "html_extract": (
        "test_lifecycle_pins.py::test_html_extract_matches_python"
    ),
    "lm_perplexity": (
        "test_lifecycle_pins.py::test_lm_perplexity_matches_python"
    ),
    "curate_corpus": (
        "test_lifecycle_pins.py::test_curate_corpus_matches_python"
    ),
    # round-15 pin-throughput batch 7: the five remaining multimodal
    # entries — each real encode/decode round trip verified against an
    # independent pure-python recomputation of its closed-form recipe
    # (the multimodal_video/gif pin standard)
    "multimodal_pixels": (
        "test_multimodal_pins.py::test_multimodal_pixels_matches_recipe"
    ),
    "multimodal_frames": (
        "test_multimodal_pins.py::test_multimodal_frames_matches_recipe"
    ),
    "multimodal_audio": (
        "test_multimodal_pins.py::test_multimodal_audio_matches_recipe"
    ),
    "multimodal_flac": (
        "test_multimodal_pins.py::test_multimodal_flac_matches_recipe"
    ),
    "multimodal_jpeg": (
        "test_multimodal_pins.py::test_multimodal_jpeg_matches_recipe"
    ),
    # round-15 mid-round addition: the span-removal transform's full
    # output (counts + rebuilt text, string-exact) recomputed by a
    # brute-force posting dict
    "dedup_spans": (
        "test_docops_pins.py::test_dedup_spans_matches_python"
    ),
    # round-15 mid-round addition: one file's stored bitmap rebuilt
    # byte-for-byte from the raw parquet values in pure python, plus
    # skip/fail-open/rewrite contracts in the same suite
    "bloom_table_read": (
        "test_bloom_table.py::test_bloom_math_matches_stored_bitmap"
    ),
    # round-16 mid-round addition: the entry's final aggregate
    # (delete low decile, n_chars := -1 top decile, every epoch
    # replayed) recomputed in pure python over the raw parquet —
    # exact integer arithmetic
    "versioned_txn_dml": (
        "test_r16_lakehouse.py::test_versioned_txn_dml_matches_python"
    ),
    # round-16 mid-round addition: an auto-width stored bitmap
    # rebuilt byte-for-byte in pure python (hand-rolled width
    # doubling + md5 positions), pre-evolution files asserted
    # bitmap-free, plus the entry's lookup landed on the raw parquet
    "bloom_evolved_read": (
        "test_r16_lakehouse.py::test_bloom_evolved_bitmap_matches_python"
    ),
    # round-16 mid-round addition: the replaced-slice final state
    # recomputed in pure python over the raw parquet (exact ints),
    # plus atomicity/containment/carried-file contracts in the same
    # suite
    "replace_where_read": (
        "test_r16_lakehouse.py::test_replace_where_read_matches_python"
    ),
    # round-14 pin-throughput batch (the capacity lever the r14
    # analysis identified): seven relational/core entries recomputed
    # in pure python over the collected sf0.001 tables
    "count_rows": "test_relational_pins.py::test_count_rows_matches_python",
    "revenue_by_nation": (
        "test_relational_pins.py::test_revenue_by_nation_matches_python"
    ),
    "top_orders": "test_relational_pins.py::test_top_orders_matches_python",
    "pricing_summary": (
        "test_relational_pins.py::test_pricing_summary_matches_python"
    ),
    "customer_order_counts": (
        "test_relational_pins.py::test_customer_order_counts_matches_python"
    ),
    "large_orders": (
        "test_relational_pins.py::test_large_orders_matches_python"
    ),
    "customers_no_big_orders": (
        "test_relational_pins.py::test_customers_no_big_orders_matches_python"
    ),
    "forecast_revenue": (
        "test_relational_pins.py::test_forecast_revenue_matches_python"
    ),
    "order_priority_stats": (
        "test_relational_pins.py::test_order_priority_stats_matches_python"
    ),
    "promo_revenue_share": (
        "test_relational_pins.py::test_promo_revenue_share_matches_python"
    ),
    "shipping_priority": (
        "test_relational_pins.py::test_shipping_priority_matches_python"
    ),
    "returned_item_report": (
        "test_relational_pins.py::test_returned_item_report_matches_python"
    ),
    "top_suppliers_per_nation": (
        "test_relational_pins.py::test_top_suppliers_per_nation_matches_python"
    ),
    "nation_trade_volume": (
        "test_relational_pins.py::test_nation_trade_volume_matches_python"
    ),
    "product_line_revenue": (
        "test_relational_pins.py::test_product_line_revenue_matches_python"
    ),
    "segment_part_overlap": (
        "test_relational_pins.py::test_segment_part_overlap_matches_python"
    ),
    "top_supplier": (
        "test_relational_pins.py::test_top_supplier_matches_python"
    ),
    "nation_revenue_share": (
        "test_relational_pins.py::test_nation_revenue_share_matches_python"
    ),
    "idle_rich_customers": (
        "test_relational_pins.py::test_idle_rich_customers_matches_python"
    ),
    "late_order_priorities": (
        "test_relational_pins.py::test_late_order_priorities_matches_python"
    ),
    "sole_late_suppliers": (
        "test_relational_pins.py::test_sole_late_suppliers_matches_python"
    ),
    "word_count": (
        "test_relational_pins.py::test_word_count_matches_python"
    ),
    "freq_items": (
        "test_relational_pins.py::test_freq_items_matches_python"
    ),
    "tokenize_distinct": (
        "test_relational_pins.py::test_tokenize_distinct_matches_python"
    ),
    # existing brute-force/golden suites that already ARE full-
    # semantics recomputations of these entries' kernels:
    "apriori_rules": (
        "test_apriori.py::test_matches_brute_force_on_events"
    ),
    "freq_itemsets": (
        "test_property_mining.py::test_both_kernels_match_brute_force"
    ),
    "events_top_users": (
        "test_relational_pins.py::test_events_top_users_matches_python"
    ),
    "events_user_quartiles": (
        "test_relational_pins.py::test_events_user_quartiles_matches_python"
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
    # (r16's three additions got r16 driver rows inside the r16 window
    # itself — their exemption is spent; r17 mid-round additions land
    # here)
    "versioned_date_bloom_read": 17,
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
    retired: frozenset[str] = frozenset(),
) -> list[str]:
    """The rotation invariant as a pure function (unit-testable against
    synthetic histories): never-sampled entries and any unpinned entry
    ≥3 rounds stale MUST be in the first WINDOW positions; pinned
    entries get a 4-round cap so they still rotate eventually; retired
    entries (pinned + ≥3 green driver rounds, criteria asserted in
    test_retired_entries_meet_criteria) are outside the rotation."""
    head = set(order[:WINDOW])
    violations = []
    for name in order:
        if name in head or name in retired:
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


def _green_rounds_by_entry() -> dict[str, set[int]]:
    """entry -> every round with a fully-green driver row."""
    greens: dict[str, set[int]] = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        r = int(p.stem.split("_r")[1])
        for name, v in json.loads(p.read_text()).items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match", True)
            ):
                greens.setdefault(name, set()).add(r)
    return greens


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


def test_retired_entries_meet_criteria():
    """Every retired entry must satisfy BOTH retirement criteria,
    recomputed from the data: (a) pinned — a full-semantics independent
    recomputation runs in every pytest; (b) ≥3 distinct green driver
    rounds in the CORRECTNESS history. Retired entries must also stay
    registered (the judge's full oracle sweep still covers them) and
    sit strictly at the tail of the sampling order."""
    pinned = _pinned()
    greens = _green_rounds_by_entry()
    for name in Q.RETIRED_TO_PYTEST:
        assert name in Q.QUERIES and name in Q.ORACLES, name
        assert name in pinned, f"{name}: retired but not pinned"
        assert len(greens.get(name, ())) >= 3, (
            f"{name}: retired with only {len(greens.get(name, ()))} "
            "green driver rounds (need ≥3)"
        )
    order = list(Q.QUERIES)
    n_active = len(order) - len(Q.RETIRED_TO_PYTEST)
    assert set(order[n_active:]) == set(Q.RETIRED_TO_PYTEST), (
        "retired entries must occupy exactly the tail of the order"
    )


def _edf_simulate(additions_per_round: int, end_round: int) -> None:
    """Replay the real history forward under an EDF scheduler with the
    retirement pipeline: each round, first retire every entry meeting
    the criteria, then sample the 50 earliest-deadline active entries
    (deadline = last green + 3 unpinned / + 5 pinned; never-sampled
    are due immediately). Additions are pinned (the de-facto policy
    since r13 — every mid-round addition ships with a GROUND_TRUTH
    pin). Fails if any round's due set exceeds the window — i.e. no
    schedule at all could satisfy the staleness invariant. Starts at
    the CURRENT round derived from the CORRECTNESS files, so the test
    stays meaningful at the next round's head without edits."""
    greens = {n: set(g) for n, g in _green_rounds_by_entry().items()}
    pinned = set(_pinned())
    entries = list(Q.QUERIES)
    last = {n: max(g) for n, g in greens.items() if n in entries}
    _, current = _last_green_by_entry()
    retired: set[str] = set()
    for r in range(current, end_round + 1):
        for n in entries:
            if n not in retired and n in pinned and len(greens.get(n, ())) >= 3:
                retired.add(n)
        active = [n for n in entries if n not in retired]

        def deadline(n: str) -> int:
            if n not in last:
                return r
            return last[n] + (5 if n in pinned else 3)

        due = [n for n in active if deadline(n) <= r]
        assert len(due) <= WINDOW, (
            f"simulated r{r}: {len(due)} entries due > {WINDOW}-slot "
            "window — rotation schedule infeasible"
        )
        window = sorted(active, key=lambda n: (deadline(n), n in pinned))
        for n in window[:WINDOW]:
            last[n] = r
            greens.setdefault(n, set()).add(r)
        for i in range(additions_per_round):
            nm = f"sim_r{r}_{i}"
            entries.append(nm)
            pinned.add(nm)


def test_rotation_capacity_is_sustainable():
    """VERDICT r13 task #2: the 50×3 ceiling had margin 2 at 148
    entries; prove the retirement mechanism keeps the schedule solvent
    well past the build horizon at the observed addition rate. Also
    keep the steady-state bound on the ACTIVE set (retired entries
    consume zero slots)."""
    pinned = _pinned()
    active = [k for k in Q.QUERIES if k not in Q.RETIRED_TO_PYTEST]
    u = len([k for k in active if k not in pinned])
    p = len([k for k in active if k in pinned])
    assert u / 3 + p / 5 <= WINDOW, (
        f"active registry outgrew the window: {u} unpinned + {p} pinned "
        f"need {u / 3 + p / 5:.1f} slots/round > {WINDOW}"
    )
    # the mandated simulation: well past the r20 build horizon at ~8
    # additions/round, additions pinned per policy. At the r16 head
    # the schedule saturated around r25; the r17 retirement wave (14
    # more entries off-rotation, active set 24 with every survivor one
    # green from eligibility) pushed the empirically-probed horizon
    # past r30 — we pin r26 (horizon + 6) as the asserted bound.
    _edf_simulate(additions_per_round=8, end_round=26)


def test_rotation_without_retirement_documented():
    """Document WHY the retirement tier exists, tracking its evolving
    justification: at the r14 rotation decision, EDF with retirement
    DISABLED failed by r18 (the 35-entry unpinned block going green
    together collided with the pinned tier's cap-4 debt) — bare
    feasibility demanded it. The r14 (26) and r15 (25) pin batches
    since moved nearly the whole registry to the cap-5 tier, so the
    counterfactual now stays feasible through the horizon; retirement
    today buys ACTIVE-SET SHRINKAGE (75 entries consuming zero driver
    slots, full sweeps staying ~5 min) rather than bare feasibility.
    Assert the dichotomy: either the no-retirement sim collapses
    before the horizon (the r14 state), or its feasibility is
    explained by the pin tier carrying the load — never by a silently
    shrunk registry."""
    greens = {n: set(g) for n, g in _green_rounds_by_entry().items()}
    pinned = set(_pinned())
    entries = list(Q.QUERIES)
    last = {n: max(g) for n, g in greens.items() if n in entries}
    for r in range(15, 27):
        def deadline(n: str) -> int:
            if n not in last:
                return r
            return last[n] + (5 if n in pinned else 3)

        due = [n for n in entries if deadline(n) <= r]
        if len(due) > WINDOW:
            return  # infeasible before the horizon, as in r14
        for n in sorted(entries, key=lambda n: (deadline(n), n in pinned))[
            :WINDOW
        ]:
            last[n] = r
        for i in range(8):
            nm = f"sim_r{r}_{i}"
            entries.append(nm)
            pinned.add(nm)
    # feasible: must be the pin tier's doing — the unpinned active set
    # alone demands well under a window even at the 2-round floor
    u = [
        n for n in Q.QUERIES
        if n not in Q.RETIRED_TO_PYTEST and n not in _pinned()
    ]
    assert len(u) / 3 + (len(Q.QUERIES) - len(Q.RETIRED_TO_PYTEST)) / 5 <= (
        WINDOW
    ), (
        "no-retirement schedule feasible but NOT explained by the pin "
        "tier - if the registry shrank, reconsider the retired tier"
    )
    assert len(Q.QUERIES) == len(set(Q.QUERIES)) and len(u) <= 30, u


def test_window_covers_every_stale_unpinned_entry():
    last, current = _last_green_by_entry()
    violations = _staleness_violations(
        list(Q.QUERIES), last, current, _pinned(), NEW_THIS_ROUND,
        Q.RETIRED_TO_PYTEST,
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


def test_simulated_next_round_rotation_is_feasible():
    """Rotation-debt solvency check: the invariant must provably hold
    through a simulated NEXT round with no new rows beyond the current
    window. Simulate: every ACTIVE entry in the CURRENT head-50 goes
    green this round, the next round's builder rotates greedily
    (most-stale first, pinned entries after unpinned at equal
    staleness, retired tier at the tail), and the invariant is
    evaluated at the next round's head. Was pinned to concrete round
    numbers (r17→r18) and re-written each round; generalized at the
    r18 head — the driver committing CORRECTNESS_r17.json mid-round
    advanced `current` and broke the pin, which is maintenance noise,
    not signal."""
    order = list(Q.QUERIES)
    last, current = _last_green_by_entry()
    sim_last = dict(last)
    for name in order[:WINDOW]:
        sim_last[name] = current
    pinned = _pinned()
    retired = Q.RETIRED_TO_PYTEST
    next_order = sorted(
        order,
        key=lambda n: (
            n in retired,  # retired tier stays at the tail
            sim_last.get(n, -1),  # most stale first; never-sampled lead
            n in pinned,  # unpinned before pinned at equal staleness
        ),
    )
    violations = _staleness_violations(
        next_order, sim_last, current + 1, pinned, {}, retired
    )
    assert not violations, "\n".join(violations)


def test_window_leads_with_thinnest_history():
    # No never-sampled entries remain (first time in the build: the
    # r16 window covered the entire active set). The r17 tie-break is
    # green-history thinness: the 7 single-green entries (r16 only)
    # lead the window.
    order = list(Q.QUERIES)
    last, _ = _last_green_by_entry()
    assert all(
        n in last for n in order if n not in NEW_THIS_ROUND
    ), [n for n in order if n not in last and n not in NEW_THIS_ROUND]
    assert order[:7] == [
        "versioned_stream_ingest", "spec_evolved_read",
        "dedup_spans", "bloom_table_read",
        "versioned_txn_dml", "bloom_evolved_read", "replace_where_read",
    ]


def test_r17_window_composition():
    """Pin the exact tiers so a mid-round insertion can't silently push
    a stale entry out of the window. After the r17 retirement wave
    (14 entries newly at ≥3 greens once CORRECTNESS_r16 landed; 125 →
    139 retired) the ACTIVE set is 24 entries, all pinned and all
    r16-green — the whole active registry fits inside one window with
    26 slots of slack."""
    # Generalized at the r18 head (the driver committing
    # CORRECTNESS_r17.json mid-round advanced every active entry's
    # latest green and broke the concrete r16/r17 pins): the tiers are
    # now asserted STRUCTURALLY against the round history on disk, so
    # the protection — a mid-round insertion can't silently push a
    # stale entry out of the window — survives each driver artifact
    # drop without a rewrite.
    order = list(Q.QUERIES)
    last, current = _last_green_by_entry()
    greens = _green_rounds_by_entry()
    pinned = _pinned()
    retired = Q.RETIRED_TO_PYTEST
    n_active = len(order) - len(retired)
    assert n_active <= WINDOW, (
        "active set outgrew the window — re-tier this test"
    )
    active = order[:n_active]
    assert all(n in pinned for n in active), [
        n for n in active if n not in pinned
    ]
    # every active entry fits in the window, so each was sampled and
    # green in the round just closed (staleness ties at 1)
    assert all(
        last.get(n) == current - 1
        for n in active
        if n not in NEW_THIS_ROUND
    ), [(n, last.get(n)) for n in active if last.get(n) != current - 1]
    # the thinnest green histories lead the window (the r17 tie-break)
    hist = [
        len(greens.get(n, ())) for n in active if n not in NEW_THIS_ROUND
    ]
    assert hist == sorted(hist), list(
        zip((n for n in active if n not in NEW_THIS_ROUND), hist)
    )
    # mid-round additions slot inside the active tier, before retired
    assert set(n for n in active if n in NEW_THIS_ROUND) == set(
        NEW_THIS_ROUND
    )
    # retired tier strictly last
    assert set(order[n_active:]) == set(retired)


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
        "r12", "r13", "r14", "r15", "r16",
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
