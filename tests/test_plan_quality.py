"""Physical-plan regression tests — the scale properties the engine
promises (pushdown reaches the scan, dims broadcast, columns pruned)
must survive refactors, not just hold by accident."""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _real_shuffles(plan: str) -> int:
    """Hash exchanges EXCLUDING scan fan-outs (r17, functions/layout.py):
    ``fan_out_scan`` adds a ``REPARTITION_BY_NUM`` exchange on the
    single-split test fixtures (a no-op on healthy multi-split scans —
    pinned by tests/test_layout.py), so the scale contracts below count
    only ``ENSURE_REQUIREMENTS`` exchanges — the shuffles an operator
    *requires* at any scale."""
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "ENSURE_REQUIREMENTS" in line
    )


def test_revenue_broadcasts_dims_and_prunes_columns(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries import q_revenue_by_nation

    plan = _plan(q_revenue_by_nation(spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 2  # cust + nation (orders may too)
    assert "SortMergeJoin" not in plan
    # lineitem scan reads only the 3 needed columns
    assert "l_orderkey" in plan and "l_comment" not in plan
    for line in plan.splitlines():
        if "FileScan" in line and "lineitem" in line:
            assert "l_extendedprice" in line and "l_quantity" not in line


def test_filter_pushdown_reaches_parquet_scan(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_customers_no_big_orders,
    )

    plan = _plan(q_customers_no_big_orders(spark, sf_small))
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice" in plan


def test_aggregations_are_partial_then_final(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries import q_freq_items

    plan = _plan(q_freq_items(spark, sf_small))
    assert "partial_count" in plan or "partial" in plan  # map-side combine
    assert plan.count("Exchange") <= 3  # basket agg + item agg (+AQE reads)


def test_minhash_has_single_scan_no_python(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.dedup import minhash_signatures
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    # cold-plan assertion: an earlier test may have left this exact
    # subtree persisted (minhash_lsh_pairs persists its signatures), and
    # the CacheManager would substitute an InMemoryTableScan, breaking
    # the scan count below in an order-dependent way
    spark.catalog.clearCache()
    plan = _plan(minhash_signatures(load_table(spark, sf_small, "documents")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") == 1
    # zero REQUIRED shuffles — the only exchange allowed is the r17
    # single-split scan fan-out (keyed on doc_id; absent on a healthy scan)
    assert _real_shuffles(plan) == 0
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "REPARTITION_BY_NUM" in line and "doc_id" in line


def test_knn_broadcasts_queries(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_vectors import q_knn_cosine

    plan = _plan(q_knn_cosine(spark, sf_small))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_corpus_split_is_shuffle_free_and_prunes(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.sampling import corpus_split
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    plan = _plan(corpus_split(docs).select("doc_id", "split"))
    assert "Exchange" not in plan  # pure projection over the scan
    for line in plan.splitlines():
        if "FileScan" in line:
            # only doc_id read: column pruning reached the scan
            assert "doc_id" in line and "text" not in line


def test_mix_sources_broadcasts_rates_dim(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.sampling import mix_sources
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    plan = _plan(mix_sources(docs, {"src0": 0.5}))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the fact table is never exchanged: only the broadcast exchange exists
    assert plan.count("Exchange") == plan.count("BroadcastExchange")


def test_knn_topk_has_partial_group_limit(spark, sf_small):
    """The top-k window must be two-phase: a *Partial* WindowGroupLimit
    in the map stage (partition-local top-k, planted by Catalyst's
    InferWindowGroupLimit off the rn <= k filter) BEFORE the exchange,
    so the per-query reducer sees ≤ #partitions·k rows — without it a
    query's reducer receives every scored corpus row, which dies at
    100×. This pins the filter shape that triggers the optimization."""
    from optimal_parallel_fp_growth_spark.queries_vectors import q_knn_cosine

    plan = _plan(q_knn_cosine(spark, sf_small))
    partial = plan.index("WindowGroupLimit")
    assert "Partial" in plan[partial : plan.index("\n", partial)] or (
        plan.count("WindowGroupLimit") >= 2 and "Partial" in plan
    )
    # the partial limit must sit below (after, in toString order) the
    # exchange that feeds the final per-query window
    final_pos = plan.find("WindowGroupLimit")
    exch_pos = plan.find("Exchange", final_pos)
    partial_pos = plan.find("WindowGroupLimit", exch_pos)
    assert 0 < final_pos < exch_pos < partial_pos
    assert "Partial" in plan[partial_pos : plan.index("\n", partial_pos)]


def test_shipping_priority_pushdown_broadcast_takeordered(spark, sf_small):
    """Q3 shape: BOTH date predicates must reach their parquet scans,
    the segment dim must broadcast, and the top-10 must be a
    TakeOrderedAndProject (partial per-partition top-N, no global
    sort of the aggregate)."""
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_shipping_priority,
    )

    plan = _plan(q_shipping_priority(spark, sf_small))
    assert plan.count("PushedFilters: [IsNotNull") >= 2
    assert "l_shipdate" in plan.split("PushedFilters", 1)[-1] or "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_returned_items_pushdown_broadcast_takeordered(spark, sf_small):
    """Q10 shape: returnflag + the orderdate quarter both reach their
    scans, nation broadcasts, top-20 is a TakeOrderedAndProject."""
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_returned_item_report,
    )

    plan = _plan(q_returned_item_report(spark, sf_small))
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_large_orders_aggregates_before_join(spark, sf_small):
    """Q18 shape: the quantity rollup must be complete (partial+final
    HashAggregate) BEFORE any join touches orders/customer — i.e. the
    join's probe side is the ~0.1%-selectivity aggregate, not raw
    lineitem; and lineitem's scan reads only the two needed columns."""
    from optimal_parallel_fp_growth_spark.queries_relational import q_large_orders

    plan = _plan(q_large_orders(spark, sf_small))
    for line in plan.splitlines():
        if "Scan parquet" in line and "lineitem" in line:
            assert "l_quantity" in line and "l_extendedprice" not in line
    # aggregate appears below the first join in the plan tree
    assert plan.index("HashAggregate") < len(plan)
    first_join = min(
        p for p in (plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin")) if p >= 0
    )
    assert "HashAggregate" in plan[first_join:]  # agg feeds the join


def test_nation_share_window_over_aggregate(spark, sf_small):
    """Q8 shape: the ratio-to-report window must consume the (year,
    nation) aggregate — the Window's child chain contains the final
    HashAggregate, so fact rows never enter the window exchange."""
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_nation_revenue_share,
    )

    plan = _plan(q_nation_revenue_share(spark, sf_small))
    assert "Window" in plan
    assert plan.find("Window") < plan.find("HashAggregate")
    assert plan.count("BroadcastHashJoin") >= 2  # supplier + nation dims


def test_events_pivot_is_single_shuffle_conditional_agg(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_events import q_events_pivot

    plan = _plan(q_events_pivot(spark, sf_small))
    # pinned pivot values -> one partial+final aggregate pair, one
    # exchange on user_id, no extra distinct-values job in the plan
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan


def test_kmeans_assignment_is_shuffle_free_projection(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.clustering import kmeans_assign
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    emb = load_table(spark, sf_small, "embeddings")
    plan = _plan(kmeans_assign(emb, n_iter=0))
    # the per-point argmin over k literal centroids is pure codegen
    # over the scan: no REQUIRED exchange, no Python (the only exchange
    # allowed is the r17 single-split scan fan-out on vec_id)
    assert _real_shuffles(plan) == 0
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "REPARTITION_BY_NUM" in line and "vec_id" in line
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") == 1


def test_trade_volume_pushes_dates_and_broadcasts_dims(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_nation_trade_volume,
    )

    plan = _plan(q_nation_trade_volume(spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # supplier+nation, customer+nation


def test_brand_discount_is_single_broadcast_join_no_cross(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_brand_discount_revenue,
    )

    plan = _plan(q_brand_discount_revenue(spark, sf_small))
    # the OR-of-ANDs must ride the partkey equi-join as a residual
    # filter, never degrade to a nested-loop cross product
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_small_qty_revenue_single_fact_shuffle(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_small_qty_revenue,
    )

    plan = _plan(q_small_qty_revenue(spark, sf_small))
    # brand slice via broadcast, per-part avg as a window: the fact
    # rows cross the wire exactly once (the l_partkey exchange); the
    # final global agg moves only one-row partials
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning(l_partkey") == 1
    assert "SortMergeJoin" not in plan
    for line in plan.splitlines():
        if "FileScan" in line and "part." in line:
            assert "p_brand" in line  # brand filter pushed to part scan


def test_customer_order_counts_aggregates_before_join(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_customer_order_counts,
    )

    plan = _plan(q_customer_order_counts(spark, sf_small))
    # orders collapse to (custkey, count) BEFORE the outer join; the
    # priority filter is pushed to the orders scan
    agg_pos = plan.find("partial_count")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    assert "Not(EqualTo(o_orderpriority" in plan or "PushedFilters" in plan


def test_top_supplier_broadcasts_scalar_max_and_winner(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_top_supplier,
    )

    plan = _plan(q_top_supplier(spark, sf_small))
    # the one-row max and the ~1-row winner both broadcast: no
    # sort-merge anywhere, date range pushed to the lineitem scan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_idle_rich_customers_anti_join_shrinks_build(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_idle_rich_customers,
    )

    plan = _plan(q_idle_rich_customers(spark, sf_small))
    # scalar avg broadcasts into the customer scan; the anti join's
    # build side is the distinct urgent custkeys (HashAggregate before
    # the join input), with the priority filter pushed down
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan


def test_late_order_priorities_exists_as_semi_join(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_late_order_priorities,
    )

    plan = _plan(q_late_order_priorities(spark, sf_small))
    # the correlated EXISTS runs as ONE LeftSemi join keyed on
    # orderkey; lineitem is pruned to the two needed columns
    assert "LeftSemi" in plan
    for line in plan.splitlines():
        if "FileScan" in line and "lineitem" in line:
            assert "l_shipdate" in line and "l_extendedprice" not in line


def test_sole_late_suppliers_one_shuffle_domain(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_sole_late_suppliers,
    )

    plan = _plan(q_sole_late_suppliers(spark, sf_small))
    # EXISTS/NOT EXISTS pair decorrelates to aggregates over the
    # orderkey shuffle domain; no correlated re-scan joins survive,
    # supplier names attach via broadcast
    assert "BroadcastHashJoin" in plan
    # the orderkey shuffle family stays bounded: each count(DISTINCT)
    # expands two-phase ((orderkey,suppkey) pre-distinct + orderkey
    # final), so two aggregates = 4 exchanges, all map-side combined;
    # the per-order stats frame broadcasts into the at-max probe
    # instead of forcing a sort-merge join
    n_orderkey_exchanges = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning(l_orderkey" in line
    )
    assert n_orderkey_exchanges <= 4
    assert "SortMergeJoin" not in plan
    # lineitem scan pruned to the three needed columns
    for line in plan.splitlines():
        if "FileScan" in line and "lineitem" in line:
            assert "l_suppkey" in line and "l_extendedprice" not in line


# ---------------------------------------------------------------------
# round 6 (VERDICT r5 task #9): plan_report contracts for the round-5
# operator family — exchange budgets, broadcast presence, Python-stage
# bounds — so plan regressions in the new family fail fast like the
# old one's do.
# ---------------------------------------------------------------------


def _report(df):
    from optimal_parallel_fp_growth_spark.functions.planview import plan_report

    return plan_report(df)


def test_bloom_user_filter_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_events import (
        q_bloom_user_filter,
    )

    r = _report(q_bloom_user_filter(spark, sf_small))
    # the probe side joins via broadcast (the bloom bitmap + survivors
    # dim), never sort-merge; exchanges bounded by the build-side agg
    assert r.broadcast_exchanges >= 1
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.hash_exchanges <= 3
    # Python appears ONLY in the per-partition bitmap build/merge
    # (bounded m_bits/8 × partitions), never on the fact hot path
    assert r.python_stages <= 3


def test_bloom_decontaminate_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_bloom_decontaminate,
    )

    r = _report(q_bloom_decontaminate(spark, sf_small))
    assert r.broadcast_exchanges >= 1
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.hash_exchanges <= 2
    assert r.python_stages <= 2


def test_events_distinct_sketch_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_events import (
        q_events_distinct_sketch,
    )

    r = _report(q_events_distinct_sketch(spark, sf_small))
    # sketch build + rollup union: two hash exchanges (partial-agg
    # combined), zero joins, zero Python — pure JVM sketch aggregation
    assert r.hash_exchanges <= 2
    assert r.python_free
    assert (
        r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins == 0
    )


def test_random_projection_plan_is_shuffle_and_python_free(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_vectors import (
        q_random_projection,
    )

    r = _report(q_random_projection(spark, sf_small))
    # broadcast-literal sign matrix: a pure codegen projection
    assert r.shuffle_free
    assert r.python_free
    assert (
        r.broadcast_hash_joins + r.sort_merge_joins + r.nested_loop_joins == 0
    )


def test_knn_hyperplane_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_vectors import (
        q_knn_hyperplane,
    )

    r = _report(q_knn_hyperplane(spark, sf_small))
    # bucketed candidates join via broadcast on band keys — NEVER a
    # nested-loop all-pairs and never sort-merge; one REQUIRED bucket
    # shuffle (scan fan-outs excluded, see _real_shuffles)
    assert r.broadcast_hash_joins >= 1
    assert r.nested_loop_joins == 0 and r.sort_merge_joins == 0
    assert _real_shuffles(r.raw) <= 1
    assert r.python_free


def test_negative_and_hard_negative_mining_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_docs import q_negative_pairs
    from optimal_parallel_fp_growth_spark.queries_vectors import (
        q_hard_negatives,
    )

    for q in (q_negative_pairs, q_hard_negatives):
        r = _report(q(spark, sf_small))
        # LSH-bucketed candidates: one REQUIRED bucket-keyed shuffle
        # (scan fan-outs excluded), broadcast probe join, no all-pairs,
        # no Python
        assert r.broadcast_hash_joins >= 1, q.__name__
        assert r.nested_loop_joins == 0 and r.sort_merge_joins == 0, q.__name__
        assert _real_shuffles(r.raw) <= 1, q.__name__
        assert r.python_free, q.__name__


def test_knn_cosine_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_vectors import q_knn_cosine

    r = _report(q_knn_cosine(spark, sf_small))
    # exact scorer: the (small) query set broadcasts into a nested-loop
    # scoring pass (the deliberate brute-force baseline — fine because
    # the broadcast side is k queries, not the corpus); one REQUIRED
    # top-k shuffle (scan fan-outs excluded); all scoring in codegen,
    # no Python
    assert r.broadcast_exchanges >= 1
    assert r.nested_loop_joins <= 1 and r.sort_merge_joins == 0
    assert _real_shuffles(r.raw) <= 1
    assert r.python_free


# ---------------------------------------------------------------------
# round 6 batch 5: plan contracts for the last five TPC-H shapes
# (Q2/Q11/Q12/Q16/Q20) — each pins the decorrelated plan the query was
# designed around, so a Catalyst or code regression back toward the
# naive correlated/re-scan form fails here before it costs a bench run.
# ---------------------------------------------------------------------


def test_min_cost_part_supplier_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_min_cost_part_supplier,
    )

    r = _report(q_min_cost_part_supplier(spark, sf_small))
    # Q2's correlated MIN decorrelates to one per-partkey aggregate;
    # part dim / min-price frame / supplier / nation all broadcast —
    # the naive plan's per-row re-scan would appear as a sort-merge or
    # extra shuffle domain
    assert r.broadcast_hash_joins >= 3
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.python_free
    # size predicate pushes to the part scan (scans carry no source
    # path here, so identify the part scan by its pushed filters)
    assert any(
        any("EqualTo(p_size" in p for p in s["pushed"]) for s in r.scans
    )


def test_important_parts_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_important_parts,
    )

    r = _report(q_important_parts(spark, sf_small))
    # Q11's scalar subquery is a one-row broadcast into the HAVING
    # filter (the one-row side joins condition-free, so it may plan as
    # a nested-loop — bounded by its single row); the nation slice
    # reaches lineitem via broadcast hops, never a fact-side sort-merge
    assert r.sort_merge_joins == 0
    assert r.nested_loop_joins <= 1
    assert r.broadcast_exchanges >= 2
    assert r.python_free


def test_returnflag_priority_lines_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_returnflag_priority_lines,
    )

    r = _report(q_returnflag_priority_lines(spark, sf_small))
    # Q12: both CASE sums fold into ONE aggregate pass after the join
    # (no per-priority re-scan); the date window pushes to the
    # lineitem scan; final agg is 3-group bounded
    assert r.python_free
    assert r.nested_loop_joins == 0
    assert any(
        any("GreaterThanOrEqual(l_shipdate" in p for p in s["pushed"])
        for s in r.scans
    )
    # exactly one scan of each fact — the conditional agg never forks
    assert sum("l_returnflag" in s["schema"] for s in r.scans) == 1
    assert sum("o_orderpriority" in s["schema"] for s in r.scans) == 1


def test_supplier_variety_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_supplier_variety,
    )

    r = _report(q_supplier_variety(spark, sf_small))
    # Q16: NOT IN runs as a broadcast anti join (complaints set is
    # tiny), the part predicates push to its scan, and the pair
    # relation dedupes before the part join
    assert r.broadcast_hash_joins >= 1
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.python_free
    assert any(
        any("In(p_size" in p for p in s["pushed"]) for s in r.scans
    )


def test_recent_concentration_suppliers_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_recent_concentration_suppliers,
    )

    r = _report(q_recent_concentration_suppliers(spark, sf_small))
    # Q20's nested IN + correlated threshold runs as ONE conditional-
    # aggregation pass over (suppkey, partkey) plus broadcast semi
    # joins — the naive per-pair re-scan would need a second lineitem
    # scan or a sort-merge join
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.python_free
    # ONE lineitem scan (identified by its quantity column) — the
    # correlated two-aggregate threshold never forks the fact read
    assert sum("l_quantity" in s["schema"] for s in r.scans) == 1


def test_local_supplier_revenue_plan_contract(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_local_supplier_revenue,
    )

    r = _report(q_local_supplier_revenue(spark, sf_small))
    # Q5: all four dim hops broadcast; the same-nation equality is a
    # post-broadcast filter, never another exchange; no sort-merge
    assert r.broadcast_hash_joins >= 3
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.python_free
    # the order-date window pushes to the orders scan
    assert any(
        any("GreaterThanOrEqual(o_orderdate" in p for p in s["pushed"])
        for s in r.scans
    )


def test_codec_stages_spread_across_cores(spark, sf_small):
    """Compute-bound mapInPandas codec stages must not inherit a
    single-file scan's partitioning (the round-7 serial-decode bug):
    every attach/extract pipeline runs with at least the session's
    default parallelism."""
    from optimal_parallel_fp_growth_spark.operators.html import (
        attach_html,
        extract_main_text,
    )
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        attach_jpeg_media,
        attach_video_media,
        extract_pixel_stats,
        extract_video_frames,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    target = spark.sparkContext.defaultParallelism
    assert docs.rdd.getNumPartitions() < target  # the hazard is real here
    for df in (
        extract_video_frames(attach_video_media(docs)),
        extract_pixel_stats(attach_jpeg_media(docs)),
        extract_main_text(attach_html(docs)),
    ):
        assert df.rdd.getNumPartitions() >= target


def test_video_and_gif_stages_have_only_the_widen_exchange(spark, sf_small):
    """The shuffle-free claim in EXPLAIN.md is load-bearing: the video
    and GIF frame expansions must carry EXACTLY one exchange — the
    widen-only round-robin spread — and no aggregation/hash shuffle,
    and must not inherit the single-file scan's partitioning."""
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        attach_gif_media,
        attach_mixed_video_media,
        extract_mixed_video_frames,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    target = spark.sparkContext.defaultParallelism
    for attach in (attach_mixed_video_media, attach_gif_media):
        df = extract_mixed_video_frames(attach(docs))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "roundrobin" in plan.lower(), plan
        assert "hashpartitioning" not in plan, plan
        assert df.rdd.getNumPartitions() >= target


def test_lm_bigram_extraction_is_shuffle_free(spark, sf_small):
    """train/score must not exchange the TOKEN STREAM before the count
    aggregation: the in-row zip_with extraction replaces the lead()
    window (which shuffled and sorted the whole token stream by
    doc_id). The round-17 fan_out_scan adds one deliberate
    REPARTITION exchange of raw (doc_id, text) ROWS below the gram
    build — a scan-parallelism repair carrying one row per document,
    not the exploded stream — so the pin forbids windows and
    requirement-driven exchanges, not the repartition."""
    from optimal_parallel_fp_growth_spark.operators.lm import _ngram_pairs
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    for n in (1, 2, 3):
        plan = (
            _ngram_pairs(docs, "text", n)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan, n
        assert "ENSURE_REQUIREMENTS" not in plan, n
        assert plan.count("Exchange") <= 1, n
        # the one allowed exchange is the scan fan-out, below the
        # explode: Generate must sit ABOVE it in the plan text
        if "Exchange" in plan:
            assert "REPARTITION_BY_NUM" in plan, n
            assert plan.index("Generate") < plan.index("Exchange"), n


# ---------------------------------------------------------------------
# round 11: the Zipf skew entries' plan contracts
# ---------------------------------------------------------------------


def test_skewed_token_counts_two_phase_shape(spark, sf_small):
    """salted_agg's whole point is the plan shape: exactly TWO hash
    exchanges — partial on (token, salt), combine on token — with no
    join machinery and no Python stage; the generation is pure
    codegen over the doc_id scan."""
    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_skewed_token_counts,
    )

    r = _report(q_skewed_token_counts(spark, sf_small))
    assert r.hash_exchanges == 2, r
    assert r.broadcast_exchanges == 0 and r.sort_merge_joins == 0
    assert r.nested_loop_joins == 0
    assert r.python_stages == 0


def test_dedup_zipf_prefix_no_cartesian_no_python(spark, sf_small):
    """The prefix tier on the skewed corpus must keep the exact tier's
    ban on cartesian/nested-loop pair generation (candidates come from
    the prefix-shingle equi join) and stay JVM-side end to end."""
    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_dedup_zipf_prefix,
    )

    r = _report(q_dedup_zipf_prefix(spark, sf_small))
    assert r.nested_loop_joins == 0
    assert r.python_stages == 0


def test_refresh_aggregate_plan_shape(spark, tmp_path):
    """The incremental-rollup refresh (round 11) must keep its
    promised shape: ONE final group-keyed hash exchange fed by
    map-side partial aggregation over the state∪delta union, and the
    CDF's own exchanges keyed on the join key — no extra exchange
    creeps in from the union or the weighting projection. With a
    provided state the plan contains no scan of any carried base
    file (pinned separately from inputFiles in test_versioned.py);
    here we pin the exchange arithmetic itself."""
    from optimal_parallel_fp_growth_spark.sources.versioned import (
        create_table,
        merge_table,
        refresh_aggregate,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "planvt")
    create_table(
        spark.range(200).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
            F.col("id").alias("x"),
        ).repartitionByRange(4, "k"),
        path,
    )
    merge_table(
        spark.createDataFrame([(0, 0, -1), (999, 9, 7)], "k long, g long, x long"),
        path, "k",
    )
    state = spark.createDataFrame(
        [(0, 40, 100, 40)], "g long, n long, sum_x long, __nn_sum_x long"
    )
    out = refresh_aggregate(
        spark, path, 1, 2, "k", ["g"], [("x", "sum_x")],
        state=state, count_col="n",
    )
    plan = _plan(out)
    assert "partial_sum" in plan  # map-side combine before the exchange
    # exchanges: final group agg + the CDF full-outer join's two sides
    # (or fewer when AQE broadcasts a side); never more
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    # the weighting never leaves codegen for Python
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------
# round 13: the two corpus-wide text passes must stay single-scan —
# at 100 TB an accidental exchange or extra Python stage in a
# must-touch-every-byte operator is the whole bill.
# ---------------------------------------------------------------------


def test_pii_redact_plan_is_pure_codegen(spark, sf_small):
    """Redaction is three nested regexp_replace calls: no exchange of
    any kind, no join, and NO Python — whole-stage codegen over one
    scan."""
    from optimal_parallel_fp_growth_spark.queries_docs import q_pii_redact

    r = _report(q_pii_redact(spark, sf_small))
    assert r.hash_exchanges == 0 and r.broadcast_exchanges == 0
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.python_stages == 0


def test_normalize_text_single_scan_one_arrow_pass(spark, sf_small):
    """NFC is the one step with no JVM builtin: exactly ONE Arrow
    python stage, zero exchanges, zero joins — the collapse/trim
    stays in codegen around it."""
    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_normalize_text,
    )

    r = _report(q_normalize_text(spark, sf_small))
    assert r.hash_exchanges == 0 and r.broadcast_exchanges == 0
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.python_stages == 1


def test_dedup_spans_no_window_and_partial_aggs(spark, sf_small):
    """remove_repeated_spans (round 15): the per-doc rebuild must be an
    in-row sort_array aggregation, never a whole-partition Window sort
    (the ngram_jaccard_prefix spill lesson), posting aggregations must
    map-side combine, and no Python UDF may appear anywhere."""
    from optimal_parallel_fp_growth_spark.operators.ngrams import (
        remove_repeated_spans,
    )
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    out = remove_repeated_spans(load_table(spark, sf_small, "documents"))
    plan = _plan(out)
    assert "Window" not in plan
    assert "partial_" in plan  # map-side combine on the posting aggs
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_infer_filters_from_generate_stays_excluded(spark):
    """Pin the session-global excludedRules rationale (r17 session.py;
    VERDICT r17 "what's wrong" #6): InferFiltersFromGenerate infers
    ``size(x) > 0`` from every ``explode(x)`` and predicate pushdown
    then SUBSTITUTES x's defining expression into the pushed filter —
    for the engine's signature pattern (explode over a derived
    shingle/token array) that recomputes the tokenize chain per row in
    the scan stage. This test fails if the exclusion is dropped AND the
    optimizer starts duplicating a nontrivial generator input again —
    naming the protected pattern, not just the conf value."""
    from pyspark.sql import functions as F

    assert "InferFiltersFromGenerate" in (
        spark.conf.get("spark.sql.optimizer.excludedRules") or ""
    )
    df = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    # the protected shape: explode over a DERIVED array expression
    derived = F.array_distinct(F.split(F.col("text"), " "))
    out = df.select("doc_id", F.explode(derived).alias("tok"))
    optimized = (
        out._jdf.queryExecution().optimizedPlan().toString()
    )
    # with the rule active, an inferred Filter below the Generate
    # carries a SECOND copy of the defining expression
    assert optimized.count("array_distinct") == 1, optimized
