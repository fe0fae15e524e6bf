"""Mergeable distinct-count sketch tables (100 TB stance, engine
addition).

`count(DISTINCT x)` over a growing corpus re-shuffles the full history
every time it runs. The sketch-table pattern fixes the rescan: fold
each shard/day/source into a tiny HLL sketch ONCE (`sketch_distinct`),
persist the sketches (bytes per group, not rows), and answer any
coarser rollup — per-source, per-month, global — by unioning sketches
(`sketch_rollup`) without touching the raw data again. New batches
append new sketch rows; merges are associative and commutative, so
daily jobs and backfills compose freely.

Spark-first: `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` are JVM-side Datasketches HLL aggregates with
map-side partial folding — one shuffle of (groups × ~2^lgk bytes),
never of rows. Accuracy is ~1.04/sqrt(2^lgk) relative standard error
(lgk=12 → ~1.6%); below the sketch's coupon threshold (hundreds of
distinct values at lgk=12) Datasketches HLL is in exact mode and the
estimate IS the true count — which is why the driver's sf0.01 oracle
can pin this operator exactly while the pytest envelope covers the
estimating regime.

No counterpart in the reference (scan/mine only); infrastructure for
corpus-stats dashboards over training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sketch_distinct", "sketch_rollup", "sketch_estimate"]


def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Fold ``df`` into one HLL sketch of ``approx count(DISTINCT col)``
    per group: (*group_cols, sketch binary, n_rows). The sketch table
    is the persistable artifact — write it per batch/shard and roll up
    later with :func:`sketch_rollup`; raw rows are never needed again."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def sketch_rollup(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union sketch rows to a coarser grouping (None/[] = global) and
    estimate: (*group_cols, est_distinct, n_rows, n_sketches). Unions
    are exact over the sketch lattice — rolling up dailies equals
    sketching the whole input directly (pinned by
    ``test_sketches.py::test_merge_equals_single_shot``)."""
    group_cols = group_cols or []
    aggs = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"),
        F.sum("n_rows").alias("n_rows"),
        F.count("*").alias("n_sketches"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*aggs)
    return sketches.agg(*aggs)


def sketch_estimate(sketch: Column | str) -> Column:
    """Estimate column for a single sketch (no union), e.g. to read a
    persisted sketch table directly."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(c)


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: float,
    candidate_support: float | None = None,
) -> tuple[DataFrame, int, int]:
    """EXACT heavy hitters by two-phase sketch-then-verify (round 14):
    items of ``col`` occurring in ≥ ``threshold`` of all rows.

    Phase 1 (the scale phase): Spark's ``stat.freqItems`` — a
    single-pass, bounded-memory lossy-counting aggregate whose result
    is a SUPERSET of every item with frequency > support·n (false
    positives possible, false negatives impossible). The candidate
    list is ≤ 1/support items whatever the data size, so collecting
    it to the driver is O(1) in the input.

    Phase 2 (the exact phase): one filtered groupBy over just the
    candidates (a broadcast ``isin`` — the non-candidates never enter
    the shuffle) counts them exactly; items below ``ceil(threshold ×
    n)`` are discarded. Superset in, exact filter out ⇒ the result is
    EXACTLY the full groupBy-HAVING answer, at a fraction of its
    shuffle: the classic heavy-hitters shape for 100 TB token streams
    where the full token groupBy is the bottleneck.

    ``candidate_support`` defaults to ``threshold / 2`` — strictly
    below the threshold so boundary items cannot be lost to the
    sketch's > (strict) guarantee.

    Returns (heavy DataFrame ``(col, n)``, n_candidates, total_rows).
    """
    import math

    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    support = candidate_support if candidate_support is not None else threshold / 2
    if not (0.0 < support <= threshold):
        raise ValueError(
            f"candidate_support must be in (0, threshold], got {support}"
        )
    # freqItems' lossy-count floor: Spark requires support >= 1e-4
    support = max(support, 1e-4)
    cand = df.stat.freqItems([col], support).collect()[0][0]
    total = df.count()
    need = math.ceil(threshold * total)
    heavy = (
        df.where(F.col(col).isin(list(cand)))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= need)
    )
    return heavy, len(cand), total
