"""Approximate aggregates (absent from the reference, SURVEY §2.3):
accuracy envelope vs exact, at the default rsd."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def test_approx_count_distinct_within_tolerance(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.1


def test_freq_items_sketch_contains_all_true_heavy_hitters(spark, sf_oracle):
    """df.stat.freqItems (Karp et al. heavy hitters): no false negatives
    above the support threshold — every truly frequent value appears."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_oracle, "events")
    support = 0.15
    sketch = set(ev.stat.freqItems(["event_type"], support).first()[0])
    n = ev.count()
    truth = {
        r.event_type
        for r in ev.groupBy("event_type").count().collect()
        if r["count"] / n >= support
    }
    assert truth <= sketch and len(truth) > 0


def test_approx_percentile_brackets_exact_median(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    got = orders.agg(
        F.percentile_approx("o_totalprice", 0.5).alias("p50")
    ).first().p50
    lo, hi = orders.agg(
        F.expr("percentile(o_totalprice, 0.45)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.55)").alias("hi"),
    ).first()
    assert lo <= got <= hi
