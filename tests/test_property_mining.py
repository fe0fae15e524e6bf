"""Property-based differential test: on random small transaction sets,
both kernels must equal a brute-force itemset enumeration, and rules
must satisfy their defining identities."""

from __future__ import annotations

import math
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ALPHABET = ["a", "b", "c", "d", "e"]

baskets_strategy = st.lists(
    st.sets(st.sampled_from(ALPHABET), min_size=1).map(sorted),
    min_size=1,
    max_size=12,
)


def brute_force(baskets: list[list[str]], min_support: float) -> dict[tuple, int]:
    n = len(baskets)
    min_count = math.ceil(min_support * n)
    out: dict[tuple, int] = {}
    for k in range(1, len(ALPHABET) + 1):
        for combo in combinations(ALPHABET, k):
            cnt = sum(1 for b in baskets if set(combo) <= set(b))
            if cnt >= min_count:
                out[combo] = cnt
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=baskets_strategy, min_support=st.sampled_from([0.2, 0.4, 0.6]))
def test_both_kernels_match_brute_force(spark, baskets, min_support):
    from optimal_parallel_fp_growth_spark.operators.fpgrowth import FPGrowth

    tx = spark.createDataFrame([(b,) for b in baskets], "items array<string>")
    want = brute_force(baskets, min_support)
    for kernel in ("mllib", "pandas"):
        model = FPGrowth(min_support=min_support, kernel=kernel).fit(tx)
        got = {
            tuple(r["items"]): r["freq"] for r in model.freq_itemsets.collect()
        }
        assert got == want, f"kernel={kernel} baskets={baskets} s={min_support}"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(baskets=baskets_strategy)
def test_rule_identities(spark, baskets):
    """confidence = freq(A∪c)/freq(A); support = freq(A∪c)/N;
    lift = confidence/support(c); antecedent ∌ consequent."""
    from optimal_parallel_fp_growth_spark.operators.fpgrowth import FPGrowth

    n = len(baskets)
    tx = spark.createDataFrame([(b,) for b in baskets], "items array<string>")
    model = FPGrowth(min_support=0.2, kernel="mllib").fit(tx)
    fis = {tuple(r["items"]): r["freq"] for r in model.freq_itemsets.collect()}
    for r in model.association_rules(0.0).collect():
        ante, cons = tuple(sorted(r.antecedent)), r.consequent[0]
        union = tuple(sorted([*ante, cons]))
        assert cons not in ante
        assert math.isclose(r.confidence, fis[union] / fis[ante])
        assert math.isclose(r.support, fis[union] / n)
        assert math.isclose(r.lift, r.confidence / (fis[(cons,)] / n))
