"""Benchmark harness (SURVEY §7.2 M8, BASELINE.md protocol).

Runs the flagship FP-Growth pipeline (stock-MLlib baseline vs this
engine, same data/params) plus headline analytic queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, and prints ONE JSON line:

    {"metric": "e2e_sec", "value": N, "unit": "sec",
     "queries": {...per-stage sec...}, "sf": 0.1}

Each stage is forced with the noop sink (full computation, no driver
materialization cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# BASELINE.md flagship params: lineitem baskets, sparse regime.
FLAGSHIP_MIN_SUPPORT = 0.01
FLAGSHIP_MIN_CONFIDENCE = 0.1
# Dense regime for the full fit→rules→transform pipeline: events baskets.
EVENTS_MIN_SUPPORT = 0.03
EVENTS_MIN_CONFIDENCE = 0.2


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cpu_counters() -> tuple[int, int, int] | None:
    """(steal_jiffies, iowait_jiffies, total_jiffies) from the
    aggregate /proc/stat cpu line, or None where /proc is unavailable.
    0-indexed after the 'cpu' label: field 4 is iowait, field 7 is
    hypervisor steal. Both ride one read: round-12 forensics found
    stages inflated >2x at LOW steal, so the adjudication needs the
    second hypervisor-noise channel too."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
    except OSError:
        return None
    if parts[:1] != ["cpu"]:
        return None
    vals = [int(x) for x in parts[1:]]
    if len(vals) < 8:
        return None
    return vals[7], vals[4], sum(vals)


def _timed(
    name: str, fn, timings: dict, errors: dict, steals: dict | None = None
) -> None:
    """Time one stage; a broken stage must not zero the whole artifact
    (BENCH_r09 died rc=1 with parsed:null when a single query raised):
    record the failure and keep going — the JSON line always prints.

    Each stage also samples the cumulative hypervisor-steal counter
    before/after (VERDICT r11 task #3): this host suffers roving
    steal storms that inflate random stages 2-30x per run, and r10+r11
    each burned full bench runs proving inflated walls were steal. A
    per-stage ``steal_pct`` makes the adjudication mechanical — a wall
    >2x its BASELINE.md band is a true regression ONLY when its
    steal_pct is low; otherwise re-probe in isolation."""
    c0 = _cpu_counters()
    t0 = time.perf_counter()
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — bench isolation boundary
        errors[name] = f"{type(e).__name__}: {e}"[:300]
        print(f"  {name}: ERROR {errors[name]}", file=sys.stderr)
        return
    timings[name] = round(time.perf_counter() - t0, 3)
    c1 = _cpu_counters()
    note = ""
    if steals is not None and c0 is not None and c1 is not None:
        dtotal = c1[2] - c0[2]
        if dtotal > 0:
            steals[name] = (
                round(100.0 * (c1[0] - c0[0]) / dtotal, 2),
                round(100.0 * (c1[1] - c0[1]) / dtotal, 2),
            )
        else:
            steals[name] = (0.0, 0.0)
        note = (
            f" (steal {steals[name][0]:.1f}% iowait {steals[name][1]:.1f}%)"
        )
    print(f"  {name}: {timings[name]:.3f}s{note}", file=sys.stderr)


def main() -> None:
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.functions.caching import (
        release_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.operators.fpgrowth import FPGrowth
    from optimal_parallel_fp_growth_spark.plans.transactions import (
        transactions_from_events,
        transactions_from_lineitem,
    )
    from optimal_parallel_fp_growth_spark.queries import QUERIES
    from optimal_parallel_fp_growth_spark.session import get_session

    spark = get_session("opfpg-bench")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    steals: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        _timed(name, fn, timings, errors, steals)

    # ---- flagship: sparse lineitem baskets, baseline vs engine ----------
    # The eager setup (persist + count) runs under the same guard as the
    # timed stages: a broken input must cost only its own pipeline rows,
    # never the whole artifact (the BENCH_r09 failure mode). Setup stages
    # record into the REAL timings dict (ADVICE r10) so BENCH_FULL.json's
    # breakdown sums to e2e; they stay out of the stdout headline subset.
    # (r11 note: e2e therefore gains the two setup stages vs r10's ledger.)
    li_tx = None

    def li_setup():
        nonlocal li_tx
        li_tx = transactions_from_lineitem(spark, SF_DIR).persist()
        li_tx.count()

    timed("flagship_setup", li_setup)
    if li_tx is not None:

        def baseline():
            from pyspark.ml.fpm import FPGrowth as MLlib

            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            before = {int(i) for i in jmap.keySet().toArray()}
            model = MLlib(
                itemsCol="items",
                minSupport=FLAGSHIP_MIN_SUPPORT,
                minConfidence=FLAGSHIP_MIN_CONFIDENCE,
            ).fit(li_tx)
            _force(model.freqItemsets)
            _force(model.associationRules)
            _force(model.transform(li_tx))
            # cache symmetry (VERDICT r13 task #7): the engine stages
            # pay model.unpersist() INSIDE their timed window, so the
            # baseline pays the same sweep — dropping whatever its fit
            # left persisted beyond the shared input (none on Spark
            # 4.1.2, where ml.fpm unpersists its intermediates; the
            # sweep keeps the ratio honest if that ever changes)
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jid in jmap.keySet().toArray():
                if int(jid) not in before:
                    jmap.get(jid).unpersist()

        timed("baseline_mllib_pipeline", baseline)

        def engine_pipeline(kernel: str, name: str):
            model = FPGrowth(
                min_support=FLAGSHIP_MIN_SUPPORT,
                min_confidence=FLAGSHIP_MIN_CONFIDENCE,
                kernel=kernel,
            ).fit(li_tx)
            _force(model.freq_itemsets)
            _force(model.association_rules(FLAGSHIP_MIN_CONFIDENCE))
            _force(model.transform(li_tx, FLAGSHIP_MIN_CONFIDENCE))
            model.unpersist()

        timed("engine_pipeline", lambda: engine_pipeline("mllib", "engine"))
        timed(
            "engine_pipeline_pandas",
            lambda: engine_pipeline("pandas", "pandas"),
        )
        li_tx.unpersist()

    # ---- dense events pipeline (fit → rules → transform) ----------------
    ev_tx = None

    def ev_setup():
        nonlocal ev_tx
        ev_tx = transactions_from_events(spark, SF_DIR).persist()
        ev_tx.count()

    timed("events_setup", ev_setup)
    if ev_tx is not None:

        def events_pipeline():
            model = FPGrowth(
                min_support=EVENTS_MIN_SUPPORT,
                min_confidence=EVENTS_MIN_CONFIDENCE,
            ).fit(ev_tx)
            _force(model.association_rules(EVENTS_MIN_CONFIDENCE))
            _force(model.transform(ev_tx, EVENTS_MIN_CONFIDENCE))
            model.unpersist()

        timed("events_pipeline", events_pipeline)
        ev_tx.unpersist()

    # ---- headline analytic queries --------------------------------------
    for qname in (
        "freq_items",
        "freq_itemsets_docs",
        "revenue_by_nation",
        "top_orders",
        "pricing_summary",
        "word_count",
        "text_stats",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_clusters",
        "corpus_split",
        "mix_sources",
        "knn_cosine",
        "events_sessionize",
        "events_asof_join",
        "multimodal_features",
        # round-2 additions (baselines recorded in BASELINE.md §round-2)
        "repetition_signals",
        "tfidf_top_terms",
        "chunk_documents",
        "pack_sequences",
        "transform_self",
        # round-2 batch 2 (baselines recorded in BASELINE.md §round-2)
        "ngram_counts",
        "inverted_index",
        "source_ngram_overlap",
        "mix_temperature",
        "stratified_sample",
        "events_top_users",
        "label_centroids",
        "forecast_revenue",
        "curate_corpus",
        # round-2 batch 3 (baselines recorded in BASELINE.md §round-2)
        "kmeans_clusters",
        "semdedup",
        "dedup_lines",
        "supplier_pagerank",
        "quality_classifier",
        "nation_trade_volume",
        "events_resample",
        "events_pivot",
        # round-4 additions (scale-default auto-k paths; BASELINE.md §round-4)
        "kmeans_auto",
        "semdedup_auto",
        # round-5 additions: full-registry coverage (BASELINE.md §round-5).
        # Appended AFTER the historical sequence so earlier per-query
        # numbers stay comparable across rounds.
        # -- core mining registry rows (pipeline twins above measure the
        #    fused path; these measure the registry-entry path) --
        "count_rows",
        "tokenize_distinct",
        "freq_itemsets",
        "freq_itemsets_pfp",
        "freq_itemsets_by_lang",
        "assoc_rules",
        "transform",
        "apriori_rules",
        # -- dedup scale-default --
        "dedup_ngram_jaccard",
        "deduped_corpus",
        "deduped_corpus_cc",
        # -- arrow scale twins (driver rows added round 5) --
        "kmeans_arrow",
        "semdedup_arrow",
        # -- similarity family --
        "knn_ann",
        "knn_ivf",
        "embedding_neardup",
        # -- text/document family --
        "lang_id",
        "quality_score",
        "doc_fingerprint",
        "token_quantiles",
        "pii_stats",
        "decontaminate",
        "dq_documents",
        "weighted_sample",
        # -- events family --
        "events_windowed_counts",
        "events_funnel",
        "events_retention",
        "events_daily_rollup",
        "events_hourly_cube",
        "events_rolling",
        "events_unpivot",
        "events_user_quartiles",
        "events_interval_join",
        "events_json_props",
        # -- multimodal --
        "multimodal_frames",
        "multimodal_decode",
        # -- bucketed-edges pagerank twin --
        "supplier_pagerank_bucketed",
        # -- TPC-H relational family --
        "product_line_revenue",
        "promo_revenue_share",
        "brand_discount_revenue",
        "customers_no_big_orders",
        "top_suppliers_per_nation",
        "order_priority_stats",
        "segment_part_overlap",
        "shipping_priority",
        "returned_item_report",
        "large_orders",
        "nation_revenue_share",
        "small_qty_revenue",
        "customer_order_counts",
        "top_supplier",
        "idle_rich_customers",
        # appended at the tail AFTER the round-5 range recording so the
        # mid-sequence envelopes stay valid
        "dedup_incremental",
        "knn_ivf_index",
        "bloom_decontaminate",
        "bloom_user_filter",
        "events_distinct_sketch",
        "gopher_rules",
        "late_order_priorities",
        "sole_late_suppliers",
        "random_projection",
        "knn_hyperplane",
        "negative_pairs",
        "hard_negatives",
        "dq_events",
        "events_hopping",
        # round-6 additions (appended at the tail, before the
        # quadratic closer, so prior envelopes stay valid)
        "versioned_read",
        "multimodal_pixels",
        "versioned_merge",
        # round-6 batch-5 TPC-H shapes (Q2/Q11/Q12/Q16/Q20)
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
        # round-7 additions (appended at the tail per the protocol)
        "html_extract",
        "lm_perplexity",
        # round-9 additions: real FLAC encode+decode round trip and
        # the mixed RLE8/Y4M video round trip
        "multimodal_flac",
        "multimodal_video",
        # round-10 addition: the GIF option-matrix entry (interlace,
        # local tables, disposal 2/3, transparency)
        "multimodal_gif",
        # round-11 additions: Zipf skew-stress prefix dedup (heavy-
        # hitter shingle with df ≈ n_docs; the prefix tier's worst-case
        # row) and the salted two-phase aggregation over the same
        # heavy-hitter token stream
        "dedup_zipf_prefix",
        "skewed_token_counts",
        "skewed_doc_hotness",
        # round-11 additions: Hive-partitioned layout lifecycle (write
        # partitionBy(day), plan-time partition pruning, rollup) and
        # the small-file compaction lifecycle (24 files → coalesce
        # rewrite → atomic swap → read-back rollup)
        "hive_layout_read",
        "compacted_layout_read",
        # round-11 addition: the manifest-diff change feed (Delta CDF
        # shape) over a create → merge → delete lifecycle
        "versioned_changes",
        # round-11 addition: incremental materialized-aggregate
        # maintenance (two chained CDF-driven refreshes over the same
        # create → merge → delete lifecycle)
        "incremental_agg",
        # round-11 addition: materialized-view lifecycle (create_view
        # full scan + append/delete + ONE composite CDF sync + read)
        "materialized_view",
        # round-11 addition: maintained inverted index (posting delta
        # from the CDF, applied as one mixed merge/delete changeset)
        "incremental_index",
        # round-11 addition: merge-on-read equality deletes (sidecar
        # commit, masked read, sequence-rule re-insert)
        "mor_delete_read",
        # round-12 addition: pruned term lookups through the maintained
        # index (build → COW text rewrite + MOR delete → one cluster-
        # preserving sync → 4 stat-pruned searches, fail-closed on
        # files_scanned)
        "index_search",
        # round-12 addition: streaming CDF follow (five-commit COW/MOR/
        # restore lifecycle drained one micro-batch per commit into a
        # replica table through the checkpointed cursor)
        "versioned_stream_follow",
        # round-15 addition: exactly-once streaming ingest (real
        # availableNow stream, one txn-stamped version per micro-batch,
        # duplicated-epoch replay proven a no-op in-query)
        "versioned_stream_ingest",
        # round-15 addition: partition-spec evolution (metadata-only
        # bucket-spec change, per-era pruning proven with one-file
        # probes on both sides of the boundary)
        "spec_evolved_read",
        # round-15 addition: substring-level dedup as a TRANSFORM
        # (repeated 6-gram spans removed, text rebuilt string-exact)
        "dedup_spans",
        # round-15 addition: manifest bloom file-skipping (scattered-
        # key point lookups open ~1 file; absent keys open zero)
        "bloom_table_read",
        # round-16 addition: exactly-once DML (delete/update/compact
        # each txn-stamped and REPLAYED in-query — replays must be
        # zero-IO no-ops)
        "versioned_txn_dml",
        # round-16 addition: auto-sized manifest blooms added mid-life
        # via spec evolution (pre-bloom files fail-open, post-
        # evolution files skip; widths from per-file distinct counts)
        "bloom_evolved_read",
        # round-16 addition: atomic slice replacement (the Delta
        # replaceWhere backfill shape: ONE commit swaps the middle
        # doc_id slice; leak attempt fails closed, replay no-ops)
        "replace_where_read",
        # round-17 addition: DATE-keyed manifest blooms (epoch-day
        # canonicalization shared by writer stamps and probes; 3-day
        # lookup opens <=4 files, provably-absent day opens zero,
        # bitmap bytes in lazy per-file sidecar blobs)
        "versioned_date_bloom_read",
        # round-12 addition: recorded clustering spec (create clustered
        # from hash-partitioned input → spec-driven merge re-cluster →
        # stat-pruned quintile read, fail-closed on files_scanned)
        "clustered_table_read",
        # round-13 addition: copy-on-write UPDATE (clustered create →
        # ranged update_where rewriting ONLY intersecting files,
        # fail-closed on carried-forward manifest refs)
        "versioned_update",
        # round-13 addition: aggregate pushdown to manifest metadata
        # (COUNT/MIN/MAX from footer rowcounts + file ranges across an
        # append lifecycle — zero data I/O)
        "stats_pushdown",
        # round-13 addition: multi-predicate (AND) manifest pruning —
        # a middle-quintile range read cutting files on BOTH sides,
        # fail-closed vs each single-sided predicate
        "versioned_range_read",
        # round-13 addition: z-order as a recorded cluster kind
        # (Morton-interleaved create → spec-driven merge re-interleave
        # → 2-D box read, fail-closed unless the SECONDARY dimension
        # prunes alone)
        "zorder_table_read",
        # round-13 addition: PII redaction (typed placeholders,
        # string-exact vs the oracle; single-scan codegen projection)
        "pii_redact",
        # round-13 addition: hash-bucketed layout (uuid-shaped keys,
        # bucket-identity merge + one-file point lookup, fail-closed
        # on carried files and files_scanned)
        "bucketed_table_merge",
        # round-13 addition: canonical text normalization (Arrow NFC
        # pass + JVM control-strip/collapse, string-exact oracle)
        "normalize_text",
        # round-13 addition: partial-column MERGE (whenMatchedUpdate
        # set-arm; poison context column ignored, ghosts not inserted)
        "merge_update_cols",
        # round-14 addition: bucket transform + sort order composed
        # (sorted 40-row slices per bucket; two-predicate lookup opens
        # exactly one file, fail-closed vs bucket-only and full scans)
        "bucketed_sorted_read",
        # round-14 addition: deterministic first-touch dedup (one
        # window shuffle; batch twin of the watermarked stream dedup)
        "events_first_touch",
        # round-14 addition: mergeable GK quantile sketch, exactness-
        # gated in-query against percentile_disc
        "events_quantile_sketch",
        # round-14 addition: exact heavy hitters by freqItems sketch +
        # candidate-only exact count (fail-closed on real pruning)
        "heavy_hitters_tokens",
        # round-14 addition: MOR-mask materialization (stats-pruned
        # rewrite, sidecars dropped, metadata answers restored)
        "purge_deletes",
        # round-14 addition: OPTIMIZE ... WHERE (hot-tail fold; carried
        # files fail-closed in-query)
        "partial_compact",
        # round-14 addition: metadata-only ALTER TABLE tier (rename
        # chain coalesce reads, stats re-key, zero-data-movement gate)
        "schema_evolution_read",
        # round-14 addition: int8 scalar quantization (pure-codegen
        # projection; reconstruction bound fail-closed in-query)
        "embedding_quantize",
    ):
        q = QUERIES[qname]

        def run(q=q):
            out = q(spark, SF_DIR)
            _force(out)
            # free tagged persisted intermediates so the long query
            # sequence never leans on LRU storage eviction
            release_cached_inputs(out)

        timed(qname, run)

    # ---- verification tiers at REDUCED SF (VERDICT r14 task #4) ----
    # The two deliberately-quadratic ngram verification tiers
    # (`max_df=0` exact + τ=0.8 ppjoin prefix on the dense-vocab
    # fixture, both documented hot-head-quadratic in dedup.py) cost
    # ~59 s = 11% of the sf0.1 e2e while the USER-path auto tier
    # (dedup_ngram_jaccard, benched above) runs ~1.2 s. Their
    # correctness gates are untouched — the driver's oracle compare
    # and the judge's sweep still run both entries against DuckDB —
    # so the bench times them at sf0.01: enough to catch a kernel
    # regression without re-paying the quadratic head every round.
    # Stage names carry the _sf001 suffix so ledgers never compare
    # them against the old sf0.1 walls. Kept at the tail: they still
    # disturb whatever runs in their wake.
    small_sf = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    tier_sf = small_sf if os.path.isdir(small_sf) else SF_DIR
    for qname in ("dedup_ngram_prefix", "dedup_ngram_exact"):
        q = QUERIES[qname]

        def run_small(q=q):
            out = q(spark, tier_sf)
            _force(out)
            release_cached_inputs(out)

        timed(f"{qname}_sf001", run_small)

    total = round(sum(timings.values()), 3)
    # record the core count the session actually ran with (r18,
    # additive): the driver's scaling probe compares runs at different
    # $SPARK_GRAFT_CPUS, and a run artifact that carries its own cpus
    # value proves the env var was honored without cross-referencing
    # launch logs.
    _cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cpus = int(_cpus_env) if _cpus_env.isdigit() else _cpus_env
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # The driver captures only a ~2000-char tail of stdout, so the final
    # JSON line must stay small (BENCH_r05 was truncated to unparseable).
    # Full per-stage timings go to BENCH_FULL.json; the stdout line carries
    # e2e plus the four headline pipeline stages and a pointer.
    full_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(
            {
                "metric": "e2e_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "steal_pct": {k: v[0] for k, v in steals.items()},
                "iowait_pct": {k: v[1] for k, v in steals.items()},
                "errors": errors,
                "sf": sf_val,
                "cpus": cpus,
            },
            f,
            indent=1,
        )
        f.write("\n")

    headline = {
        k: timings[k]
        for k in (
            "baseline_mllib_pipeline",
            "engine_pipeline",
            "engine_pipeline_pandas",
            "events_pipeline",
            # round 18 (VERDICT r17 task #2, additions-only): the four
            # pipeline stages above are driver/fixed-cost-bound at
            # sf0.1, so a headline limited to them gave the driver's
            # per-query PERF comparison and core-count scaling probe
            # no data-parallel signal (the 8-vs-32-core ratios ≈ 1
            # false-positived suspect_cpus_ignored). These ~15 stages
            # are the executor-bound cross-section: dedup/shingle
            # tiers, vector kernels, graph iteration, lakehouse
            # lifecycle, codec and skew stages. The stdout line stays
            # well under the driver's ~2000-char tail capture.
            "dedup_clusters",
            "dedup_minhash_lsh",
            "dedup_simhash",
            "dedup_zipf_prefix",
            "deduped_corpus_cc",
            "decontaminate",
            "curate_corpus",
            "kmeans_clusters",
            "knn_ivf_index",
            "semdedup",
            "supplier_pagerank",
            "supplier_pagerank_bucketed",
            "versioned_stream_follow",
            "index_search",
            "multimodal_frames",
            "skewed_token_counts",
        )
        if k in timings
    }
    steal_vals = sorted(v[0] for v in steals.values())
    steal_summary = (
        {
            "max": steal_vals[-1],
            "p50": steal_vals[len(steal_vals) // 2],
            "n_over_2pct": sum(1 for v in steal_vals if v > 2.0),
        }
        if steal_vals
        else {}
    )
    print(
        json.dumps(
            {
                "metric": "e2e_sec",
                "value": total,
                "unit": "sec",
                "queries": headline,
                "full": "BENCH_FULL.json",
                "n_stages": len(timings),
                "errors": len(errors),
                "steal": steal_summary,
                "sf": sf_val,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
