"""EPFP load-balanced group assignment — the reference's novel piece.

Reproduces the *scheme* of ``epfp/BalancedPartitioner.scala:14-46``
(described in SURVEY §4 O6; no code copied): mining cost of an item's
conditional tree grows with its rank (later-ranked = less frequent items
sit at the bottom of the tree and have longer prefixes), approximated by
``weight(rank) = log(rank + 2)``. Ranks are assigned to ``num_groups``
mining groups greedily, a chunk of ``num_groups`` ranks at a time: within
each chunk the partitions are re-sorted by cumulative weight descending
and the chunk's ranks (ascending weight) are handed out heaviest-
partition-first, anti-correlating new load with accumulated load.

This is *computation-per-key* skew, which Spark's AQE cannot see —
AQE balances bytes per partition, not mining cost per group — hence a
driver-side greedy plus a plain ``groupBy(group_id)``; no custom
partitioner or Catalyst rule is needed.
"""

from __future__ import annotations

import math


def balanced_group_assignment(num_items: int, num_groups: int) -> list[int]:
    """rank (0-based, frequency-descending) → group id."""
    if num_groups <= 0:
        raise ValueError(f"num_groups must be positive but got {num_groups}")
    assignment = [0] * num_items
    cum = [0.0] * num_groups
    for start in range(0, num_items, num_groups):
        chunk = range(start, min(start + num_groups, num_items))
        # heaviest partitions first get the lightest (earliest) ranks
        order = sorted(range(num_groups), key=lambda g: -cum[g])
        for g, rank in zip(order, chunk):
            assignment[rank] = g
            cum[g] += math.log(rank + 2)
    return assignment


def hash_group_assignment(num_items: int, num_groups: int) -> list[int]:
    """PFP's plain hash partitioner (pfp/FPGrowthCore.scala:56-58):
    group = rank mod num_groups."""
    if num_groups <= 0:
        raise ValueError(f"num_groups must be positive but got {num_groups}")
    return [r % num_groups for r in range(num_items)]
