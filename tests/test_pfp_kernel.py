"""Cross-kernel agreement: the self-contained pandas PFP kernel must mine
exactly the same itemsets as MLlib's JVM kernel (the reference's upstream),
with both balanced (EPFP) and hash (PFP) group assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark import FPGrowth
from optimal_parallel_fp_growth_spark.operators.balanced import (
    balanced_group_assignment,
    hash_group_assignment,
)
from optimal_parallel_fp_growth_spark.plans.transactions import (
    transactions_from_events,
    transactions_from_lineitem,
)


def as_dict(df):
    return {tuple(r["items"]): r["freq"] for r in df.collect()}


@pytest.mark.parametrize("balanced", [True, False])
def test_kernels_agree_on_events(spark, sf_small, balanced):
    tx = transactions_from_events(spark, sf_small)
    ml = FPGrowth(min_support=0.03, kernel="mllib").fit(tx)
    pd_ = FPGrowth(min_support=0.03, kernel="pandas", balanced=balanced,
                   num_partitions=4).fit(tx)
    assert as_dict(pd_.freq_itemsets) == as_dict(ml.freq_itemsets)


def test_kernels_agree_on_lineitem(spark, sf_small):
    tx = transactions_from_lineitem(spark, sf_small)
    ml = FPGrowth(min_support=0.002, kernel="mllib").fit(tx)
    pd_ = FPGrowth(min_support=0.002, kernel="pandas").fit(tx)
    assert as_dict(pd_.freq_itemsets) == as_dict(ml.freq_itemsets)


def test_empty_result(spark, sf_small):
    tx = transactions_from_events(spark, sf_small)
    model = FPGrowth(min_support=0.99, kernel="pandas").fit(tx)
    assert model.freq_itemsets.count() == 0
    assert model.association_rules(0.5).count() == 0


def test_single_group(spark, fpm_train):
    # num_partitions=1 is the reference's "sequential FP" baseline (fp/FP.scala:33)
    model = FPGrowth(min_support=0.4, kernel="pandas", num_partitions=1).fit(fpm_train)
    assert model.freq_itemsets.count() == 10


@pytest.mark.parametrize("balanced", [True, False])
def test_grouped_mining_matches_per_corpus_runs(spark, sf_small, balanced):
    """mine_pandas_by(corpus_col) must equal running the ungrouped kernel
    once per corpus at that corpus's own ceil(minSupport·n) threshold —
    per-corpus dictionaries and thresholds, no cross-corpus leakage."""
    import math

    from optimal_parallel_fp_growth_spark.operators.pfp_kernel import (
        mine_pandas,
        mine_pandas_by,
    )
    from optimal_parallel_fp_growth_spark.plans.transactions import (
        transactions_from_documents_by_lang,
    )

    ms = 0.6
    tx = transactions_from_documents_by_lang(spark, sf_small)
    got = {
        (r["lang"], tuple(sorted(r["items"]))): r["freq"]
        for r in mine_pandas_by(
            tx, "lang", min_support=ms, num_partitions=4, balanced=balanced
        ).collect()
    }

    want = {}
    for lang_row in tx.select("lang").distinct().collect():
        lang = lang_row["lang"]
        sub = tx.where(F.col("lang") == lang).select("items")
        mc = max(1, math.ceil(ms * sub.count()))
        for r in mine_pandas(sub, mc, num_partitions=4).collect():
            want[(lang, tuple(sorted(r["items"])))] = r["freq"]

    assert got == want
    assert len({lang for lang, _ in got}) > 1  # exercised multiple corpora


def test_grouped_mining_empty_and_unknown_corpus(spark):
    from optimal_parallel_fp_growth_spark.operators.pfp_kernel import mine_pandas_by

    empty = spark.createDataFrame([], "lang string, items array<string>")
    assert mine_pandas_by(empty, "lang", min_support=0.5).count() == 0
    # all-infrequent input → empty, not an error
    rows = [("a", ["x"]), ("a", ["y"]), ("a", ["z"])]
    df = spark.createDataFrame(rows, "lang string, items array<string>")
    assert mine_pandas_by(df, "lang", min_support=0.9).count() == 0


def test_balanced_assignment_properties():
    for n_items, n_groups in [(0, 4), (3, 4), (100, 4), (1000, 7)]:
        a = balanced_group_assignment(n_items, n_groups)
        assert len(a) == n_items
        assert all(0 <= g < n_groups for g in a)
        if n_items >= n_groups:
            assert len(set(a)) == n_groups  # every group used
    h = hash_group_assignment(10, 3)
    assert h == [0, 1, 2, 0, 1, 2, 0, 1, 2, 0]


def test_balanced_is_more_balanced_than_hash():
    """The greedy should spread log-weight strictly better than modulo on
    a tail-heavy rank distribution."""
    import math

    n, g = 10_000, 8
    for assign_fn in (balanced_group_assignment,):
        a = assign_fn(n, g)
        w = [0.0] * g
        for r, grp in enumerate(a):
            w[grp] += math.log(r + 2)
        spread_balanced = max(w) - min(w)
    hw = [0.0] * g
    for r, grp in enumerate(hash_group_assignment(n, g)):
        hw[grp] += math.log(r + 2)
    spread_hash = max(hw) - min(hw)
    assert spread_balanced <= spread_hash
