"""Iterative graph analytics over DataFrames — PageRank, the second
iterative primitive next to ``dedup.connected_components`` (no
reference counterpart; the reference mines itemsets only).

``pagerank`` runs a fixed number of power-iteration rounds:

    r₀(v)   = 1 / N
    rₜ₊₁(v) = (1 − d) / N + d · Σ_{u→v} rₜ(u) / outdeg(u)

This is the non-redistributing variant: a dangling node (no
out-edges) simply leaks its mass each round, shrinking Σr below 1 —
the standard simplification when the caller symmetrizes the graph
(every node then has outdeg ≥ 1, nothing leaks; the
``supplier_pagerank`` query does exactly that).

Scale shape: out-degrees are joined onto the edge list ONCE before the
loop and the result persisted + ``localCheckpoint``-ed (flat lineage —
an iterative plan that re-derives its input every round grows
exponentially). Each round is one shuffle-join of the edge list with
the current rank vector on ``src`` followed by one ``sum`` shuffle on
``dst`` — both keyed shuffles an AQE-planned cluster handles at any
scale, with per-round ``localCheckpoint`` keeping the plan flat and
failure recovery bounded to one round. Ranks are rounded to 9 decimals
every round so results are reproducible across engines and cluster
sizes (summation-order ulps stay below the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITER = 3
PR_DECIMALS = 9


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    n_iter: int = PR_ITER,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.
    → (node, rank), one row per node appearing as src or dst,
    rank rounded to 9 decimals.

    ``assume_distinct=True`` skips the defensive edge dedup shuffle —
    pass it when the caller already produced a distinct edge list
    (e.g. a ``.distinct()``-ed join output plus its loss-free
    reversal), saving one full-edge-list shuffle."""
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0,1], got {damping}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    # The edge build upstream of this operator can be arbitrarily
    # expensive (joins, unions). Materialize it exactly ONCE —
    # everything below (degrees, degree-annotated edges, node set)
    # derives from the checkpointed blocks instead of re-running the
    # build per derivation.
    e = e.localCheckpoint()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # materialized once, read every round: localCheckpoint both caches
    # the blocks and cuts the lineage the loop would otherwise re-derive
    ed = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n  # same double arithmetic as the oracle
    r = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = ed.join(r, ed.src == r.node).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("outdeg")).alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(base) + damping * F.coalesce("s", F.lit(0.0)),
                    PR_DECIMALS,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return r
