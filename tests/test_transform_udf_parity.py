"""The reference-literal broadcast-UDF transform (Option A) must equal
the declarative broadcast-join transform (Option B) everywhere."""

from __future__ import annotations

from optimal_parallel_fp_growth_spark.operators.fpgrowth import FPGrowth
from optimal_parallel_fp_growth_spark.operators.transform import (
    transform_with_rules,
    transform_with_rules_udf,
)
from optimal_parallel_fp_growth_spark.plans.transactions import (
    transactions_from_events,
)


def _preds(df, keys):
    return {tuple(r[k] for k in keys): r.prediction for r in df.collect()}


def test_udf_and_join_transform_agree_on_textbook(spark, fpm_train, fpm_test):
    model = FPGrowth(min_support=0.4, min_confidence=0.5).fit(fpm_train)
    rules = model.association_rules(0.5)
    a = _preds(transform_with_rules(fpm_test, rules, keep_array=False), ["tid"])
    b = _preds(transform_with_rules_udf(fpm_test, rules), ["tid"])
    assert a == b and len(a) == 6


def test_udf_and_join_transform_agree_on_events(spark, sf_small):
    tx = transactions_from_events(spark, sf_small)
    model = FPGrowth(min_support=0.03, min_confidence=0.2).fit(tx)
    rules = model.association_rules(0.2)
    keys = ["user_id", "day"]
    a = _preds(transform_with_rules(tx, rules, keep_array=False), keys)
    b = _preds(transform_with_rules_udf(tx, rules), keys)
    assert a == b and len(a) > 0


def test_direct_and_dedupe_transform_agree(spark, fpm_train, fpm_test, sf_small):
    model = FPGrowth(min_support=0.4, min_confidence=0.5).fit(fpm_train)
    rules = model.association_rules(0.5)
    a = _preds(transform_with_rules(fpm_test, rules, keep_array=False), ["tid"])
    b = _preds(
        transform_with_rules(fpm_test, rules, keep_array=False, dedupe_baskets=False),
        ["tid"],
    )
    assert a == b

    tx = transactions_from_events(spark, sf_small)
    m2 = FPGrowth(min_support=0.03, min_confidence=0.2).fit(tx)
    r2 = m2.association_rules(0.2)
    keys = ["user_id", "day"]
    c = _preds(transform_with_rules(tx, r2, keep_array=False), keys)
    d = _preds(
        transform_with_rules(tx, r2, keep_array=False, dedupe_baskets=False), keys
    )
    assert c == d and len(c) > 0
