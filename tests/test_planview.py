"""plan_report (functions/planview.py): parsed plan counts match known
plan shapes of existing operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.planview import plan_report
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def test_shuffle_free_projection(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.textops import gopher_rules

    r = plan_report(gopher_rules(load_table(spark, sf_small, "documents")))
    assert r.shuffle_free and r.python_free
    assert len(r.scans) == 1
    assert set(r.scans[0]["schema"]) == {"doc_id", "text"}


def test_aggregation_counts_one_exchange(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    r = plan_report(ev.groupBy("event_type").agg(F.count("*").alias("n")))
    assert r.hash_exchanges == 1
    assert r.sort_merge_joins == 0 and r.broadcast_hash_joins == 0


def test_broadcast_join_and_pushdown_visible(spark, sf_small):
    from optimal_parallel_fp_growth_spark.queries_relational import (
        q_forecast_revenue,
    )

    r = plan_report(q_forecast_revenue(spark, sf_small))
    # Q6 shape: scan-bound aggregate, filters pushed to the scan
    assert any(s["pushed"] for s in r.scans)
    assert r.shuffle_free  # one-row global agg: partials only


def test_python_stage_detected(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.multimodal import (
        attach_media,
        decode_media,
    )

    media = attach_media(load_table(spark, sf_small, "documents"))
    r = plan_report(decode_media(media))
    assert r.python_stages >= 1
