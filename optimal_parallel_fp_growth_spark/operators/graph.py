"""Iterative graph analytics over DataFrames — PageRank, the second
iterative primitive next to ``dedup.connected_components`` (no
reference counterpart; the reference mines itemsets only).

``pagerank`` runs a fixed number of power-iteration rounds:

    r₀(v)   = 1 / N
    rₜ₊₁(v) = (1 − d) / N + d · Σ_{u→v} rₜ(u) / outdeg(u)

Dangling nodes (no out-edges): by default their mass simply leaks each
round, shrinking Σr below 1 — the standard simplification when the
caller symmetrizes the graph (every node then has outdeg ≥ 1, nothing
leaks; the ``supplier_pagerank`` query does exactly that).
``redistribute_dangling=True`` instead adds the classic correction —
the leaked mass Σ_{dangling u} rₜ(u) is spread uniformly over all N
nodes — computed as a 1-row aggregate broadcast into the update
expression (no per-round driver collect), keeping Σr = 1 on
non-symmetrized graphs.

Scale shape: out-degrees are joined onto the edge list ONCE before the
loop and the result persisted with a cut lineage (an iterative plan
that re-derives its input every round grows exponentially). Each round
is one shuffle-join of the edge list with the current rank vector on
``src`` followed by one ``sum`` shuffle on ``dst`` — both keyed
shuffles an AQE-planned cluster handles at any scale, with a per-round
lineage cut keeping the plan flat and failure recovery bounded to one
round. Ranks are rounded to 9 decimals every round so results are
reproducible across engines and cluster sizes (summation-order ulps
stay below the rounding grain).

Lineage cuts come in two grades. ``reliable=False`` (default) uses
``localCheckpoint`` — executor-local blocks, zero I/O, right for
local[] and for clusters with stable executors, but a lost executor
forces recompute-from-scratch because the lineage is GONE.
``reliable=True`` writes each cut to the SparkContext checkpoint
directory (set it to durable storage — HDFS/S3 — via
``sc.setCheckpointDir``; if unset, a session-local temp dir is used and
a cluster deployment should override it), making executor loss cost
one re-read instead of a full restart — the cluster-grade setting for
long chains over 100 TB graphs.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.caching import (
    RddBlockHandle,
    materialize_pending_caches,
    persistent_rdd_ids,
    tag_cached_inputs,
    unpersist_blocks,
)

PR_DAMPING = 0.85
PR_ITER = 3
PR_DECIMALS = 9

# bucketed_edges="auto" flips to the bucketed-table edge layout at this
# many edges. Measured (BASELINE.md §round-5 scale probe, local[32]):
# 11.7 M edges (sf1) — bucketed 1.19x SLOWER (one-time write dominates);
# 117 M edges (sf10) — bucketed 2.3x FASTER (504.5 s → 218.0 s; the
# block-manager working set the plain path pays is gone, shuffle −38%).
# 30 M sits below the log-midpoint because the small-side penalty is
# bounded (~1.2x) while the large-side win compounds with scale.
BUCKETED_EDGE_CROSSOVER = 30_000_000


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        # local-mode fallback; cluster callers set a durable path.
        # Registered for interpreter-exit cleanup so repeated sessions
        # don't strand checkpoint files in /tmp.
        d = tempfile.mkdtemp(prefix="opfpg-ckpt-")
        warnings.warn(
            "reliable=True with no sc.setCheckpointDir(): falling back "
            f"to driver-local temp dir {d} — this gives NO durability "
            "on a multi-node cluster; set a durable (HDFS/S3) "
            "checkpoint dir in production",
            RuntimeWarning,
            stacklevel=3,
        )
        sc.setCheckpointDir(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)


def _cut(df: DataFrame, reliable: bool) -> DataFrame:
    """Materialize ``df`` and cut its lineage (see module docstring)."""
    if reliable:
        _ensure_checkpoint_dir(df)
        return df.checkpoint()
    return df.localCheckpoint()


def _bucketed_edge_table(
    spark, ed: DataFrame, n_buckets: int, key: str = "src",
    outdeg_over: str | None = None,
) -> tuple[str, DataFrame]:
    """Persist a loop-invariant edge list as a table BUCKETED on its
    per-round join key and hand back a scan of it. Every later
    edges⋈(ranks|labels) join then satisfies the edge side's
    distribution from the bucketed layout: only the (small) iterating
    side is exchanged per round, and the edge list lives in
    storage-format parquet instead of block-manager rows — the two
    per-round costs the localCheckpoint/persist variants pay. The
    repartition aligns write tasks with bucket ids (both murmur3 on
    the key) so each bucket is a single sorted file.

    ``outdeg_over`` (round 18): annotate each edge with its source's
    out-degree as a window count RIDING the alignment exchange (the
    window's ClusteredDistribution(col) is satisfied by the
    repartition) instead of the former ``edges ⋈ groupBy(src).count``
    input, whose plan paid THREE exchanges of the edge list (e-side
    join hash, the aggregation, then the alignment repartition —
    guide §2.4: two operations keyed the same way share one
    exchange). Values are identical: count(*) over partitionBy(src)
    of a distinct edge list IS the out-degree the join annotated."""
    from pyspark.sql import Window

    name = f"opfpg_pr_edges_{uuid.uuid4().hex}"
    w = ed.repartition(n_buckets, key)
    if outdeg_over is not None:
        w = w.withColumn(
            "outdeg",
            F.count(F.lit(1)).over(Window.partitionBy(outdeg_over)),
        )
    (
        w.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )
    return name, spark.table(name)


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    n_iter: int = PR_ITER,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
    assume_symmetric: bool = False,
    redistribute_dangling: bool = False,
    reliable: bool = False,
    bucketed_edges: bool | str = "auto",
    n_buckets: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.
    → (node, rank), one row per node appearing as src or dst,
    rank rounded to 9 decimals.

    ``assume_distinct=True`` skips the defensive edge dedup shuffle —
    pass it when the caller already produced a distinct edge list
    (e.g. a ``.distinct()``-ed join output plus its loss-free
    reversal), saving one full-edge-list shuffle.

    ``assume_symmetric=True`` declares the edge set closed under
    reversal (u→v implies v→u — what callers that symmetrize get by
    construction). Then every node has ≥1 in-edge whose src is ranked,
    so the per-round contribution sums already cover every node and
    the ``nodes``-side left join that fills absent sums with 0 is the
    identity — each round skips it outright (guide §2.4: one fewer
    shuffle join per round; ranks are bit-identical because covered
    rows take the same ``base + d·s`` arm). Ignored when
    ``redistribute_dangling=True`` (a symmetric graph has no dangling
    nodes — the correction is already a no-op there).

    ``bucketed_edges=True`` is the big-graph path: the loop-invariant
    degree-annotated edge list is written ONCE as a parquet table
    bucketed on ``src`` (``n_buckets``, default the session's shuffle
    partitions) instead of held as localCheckpoint blocks. Each
    round's edges⋈ranks join then reads the pre-partitioned scan —
    no per-round exchange of the edge side (the largest shuffle
    component, saved (n_iter−1)× after the one-time bucketed write)
    and no edge working set in the block manager. Costs one managed
    table (dropped before returning; the returned ranks are
    materialized first, so they never reference it). Numerics are
    unchanged — the per-round 9-decimal rounding already absorbs
    partial-aggregation order differences.

    The default ``"auto"`` counts the materialized edge list (one
    cheap job over local blocks) and flips to the bucketed layout at
    ``BUCKETED_EDGE_CROSSOVER`` edges — measured 2.3x faster at the
    117 M-edge decade, ~1.2x slower below 12 M (see the constant's
    comment); explicit True/False skips the count."""
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0,1], got {damping}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    spark = edges.sparkSession
    # The edge build upstream of this operator can be arbitrarily
    # expensive (joins, unions). Materialize it exactly ONCE —
    # everything below (degrees, degree-annotated edges, node set)
    # derives from the materialized blocks instead of re-running the
    # build per derivation. Block hygiene mirrors
    # dedup.connected_components: every localCheckpoint's blocks are
    # freed at the first point nothing live reads them (e after the
    # derived cuts exist; round N−1's ranks after round N; the
    # loop-invariant cuts after the loop), and only the FINAL result's
    # blocks survive, handed to the tag/release lifecycle. Under
    # reliable=True the cuts are file-backed checkpoints with no
    # persistent RDDs, so every id-diff is empty and this is a no-op.
    # Registry-pending upstream caches must materialize BEFORE the
    # baseline snapshot — a lazy one would first materialize inside the
    # e-cut diff window, land in e_ids, and be unpersisted mid-operator,
    # defeating the multi-reference cache its operator registered it
    # for. (Caller-persisted frames NOT in the registry keep the same
    # hazard — materialize them before calling, or register them.)
    materialize_pending_caches()
    e_ids: set[int] = set()
    if bucketed_edges is not True:
        # An EXPLICIT bucketed_edges=True skips this cut: the bucketed
        # write below is itself the one materialization of the edge
        # build (one pass, straight into the table layout), and every
        # later derivation (nodes, dangling) reads the table scan —
        # so a localCheckpoint here would only add a second full pass
        # plus a block-manager working set (guide §1.2). "auto" still
        # cuts first: its crossover count must not re-run the build.
        seen = persistent_rdd_ids(spark)
        e = _cut(e, reliable)
        e_ids = persistent_rdd_ids(spark) - seen
    if bucketed_edges == "auto":
        bucketed_edges = e.count() >= BUCKETED_EDGE_CROSSOVER
    # lazy: evaluated only by the non-bucketed branches below (the
    # bucketed write annotates out-degrees itself, and with an
    # explicit bucketed_edges=True `e` is uncut — evaluating deg here
    # would re-run the whole edge build)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # materialized once, read every round
    edge_table = None
    ed_cache = None
    if bucketed_edges:
        if n_buckets is None:
            n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        edge_table, ed = _bucketed_edge_table(
            spark, e, n_buckets, outdeg_over="src"
        )
        ed_ids: set[int] = set()
    elif not reliable:
        # A localCheckpoint cut would erase the layout (LogicalRDD
        # reports UnknownPartitioning under AQE), forcing every round's
        # edges⋈ranks join to RE-exchange and RE-sort the loop-invariant
        # edge list. Persisting it partitioned+sorted on src instead
        # keeps the InMemoryRelation's HashPartitioning/SortOrder
        # visible to the planner: each round's SortMergeJoin then reads
        # the cached edge blocks with no exchange and no sort — only
        # the (node, rank) side pays one (guide §2.4; the in-memory
        # twin of the bucketed-table layout). Robustness is unchanged
        # vs the localCheckpoint cut: either way an executor loss under
        # reliable=False forces a restart.
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        ed_cache = (
            e.join(deg, "src")
            .repartition(n_part, "src")
            .sortWithinPartitions("src")
            .persist()
        )
        ed_cache.count()
        ed = ed_cache
        ed_ids = set()
    else:
        seen = persistent_rdd_ids(spark)
        ed = _cut(e.join(deg, "src"), reliable)
        ed_ids = persistent_rdd_ids(spark) - seen
    seen = persistent_rdd_ids(spark)
    # node set from the MATERIALIZED degree-annotated edge list (every
    # branch above has forced ed by here) — same rows as e, so the
    # same node set, without touching e, which under an explicit
    # bucketed_edges=True is the raw (uncut) build plan
    nodes = _cut(
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct(),
        reliable,
    )
    node_ids = persistent_rdd_ids(spark) - seen
    n = nodes.count()
    if n == 0:
        unpersist_blocks(spark, e_ids | ed_ids)
        if edge_table is not None:
            spark.sql(f"DROP TABLE IF EXISTS {edge_table}")
        if ed_cache is not None:
            ed_cache.unpersist()
        return tag_cached_inputs(
            nodes.withColumn("rank", F.lit(0.0)),
            RddBlockHandle(spark, node_ids),
        )
    base = (1.0 - damping) / n  # same double arithmetic as the oracle
    r = nodes.withColumn("rank", F.lit(1.0 / n))
    dangling = None
    loop_ids = set(ed_ids)
    if redistribute_dangling:
        # nodes with no out-edges; tiny relative to the edge list, and
        # the per-round mass aggregate over it is a 1-row DataFrame
        seen = persistent_rdd_ids(spark)
        # src set from the materialized ed, not deg: deg's plan reads
        # e, which an explicit bucketed_edges=True leaves uncut; the
        # anti join ignores right-side duplicates, so the set of src
        # values is all that matters
        dangling = _cut(
            nodes.join(ed.select(F.col("src").alias("node")), "node", "anti"),
            reliable,
        )
        loop_ids |= persistent_rdd_ids(spark) - seen
    # deg/ed/nodes/dangling are all materialized — e's blocks are dead
    unpersist_blocks(spark, e_ids)
    prev_r_ids: set[int] = set()
    for _ in range(n_iter):
        contrib = ed.join(r, ed.src == r.node).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("outdeg")).alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        if dangling is not None:
            # leaked mass this round, as a 1-row aggregate attached to
            # every node via a broadcast nested-loop join — no
            # per-round driver collect
            dm = dangling.join(r, "node").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
            lhs = nodes.crossJoin(F.broadcast(dm))
        elif assume_symmetric:
            # sums covers every node (docstring): the nodes-side left
            # join is the identity — the round is just the covered arm
            # of the generic update, evaluated over sums directly
            lhs = None
        else:
            lhs = nodes.withColumn("__dm", F.lit(0.0))
        if lhs is None:
            upd = sums.select(
                "node",
                F.round(
                    F.lit(base) + damping * F.col("s"), PR_DECIMALS
                ).alias("rank"),
            )
        else:
            upd = lhs.join(sums, "node", "left").select(
                "node",
                F.round(
                    F.lit(base)
                    + damping
                    * (F.coalesce("s", F.lit(0.0)) + F.col("__dm") / n),
                    PR_DECIMALS,
                ).alias("rank"),
            )
        seen = persistent_rdd_ids(spark)
        r = _cut(upd, reliable)
        unpersist_blocks(spark, prev_r_ids)
        prev_r_ids = persistent_rdd_ids(spark) - seen
    if edge_table is not None:
        # no live reader: either the last round's cut materialized the
        # ranks, or (n_iter=0) the returned plan derives from nodes
        spark.sql(f"DROP TABLE IF EXISTS {edge_table}")
    if ed_cache is not None:
        # same no-live-reader argument as the table drop above
        ed_cache.unpersist()
    if n_iter > 0:
        # final plan is the last cut — loop-invariant blocks are dead
        unpersist_blocks(spark, loop_ids | node_ids)
        final_ids = prev_r_ids
    else:
        # returned plan still reads the nodes blocks
        unpersist_blocks(spark, loop_ids)
        final_ids = node_ids
    return tag_cached_inputs(r, RddBlockHandle(spark, final_ids))
