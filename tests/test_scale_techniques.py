"""Scale-technique verification: salted aggregation equals the plain
plan; bucketed tables join without a shuffle exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.skew import salted_agg
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def test_salted_agg_matches_plain(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    got = salted_agg(
        ev,
        ["event_type"],
        {"n": "count", "total": "sum:value", "vmax": "max:value"},
        discriminator="event_id",
    )
    want = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("total"),
        F.max("value").alias("vmax"),
    )
    g = {(r.event_type, r.n, round(r.total, 6), round(r.vmax, 6)) for r in got.collect()}
    w = {(r.event_type, r.n, round(r.total, 6), round(r.vmax, 6)) for r in want.collect()}
    assert g == w and len(w) > 0


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    for name, df, key in (("b_orders", orders, "o_orderkey"), ("b_li", li, "l_orderkey")):
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))  # external: keep out of ./spark-warehouse
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    joined = (
        spark.table("b_li")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        n = joined.count()
        assert n == orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            "o_orderkey"
        ).distinct().count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        for name in ("b_orders", "b_li"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_fit_validate_unique_raises(spark):
    from optimal_parallel_fp_growth_spark.operators.fpgrowth import FPGrowth

    tx = spark.createDataFrame([(["a", "a", "b"],)], "items array<string>")
    try:
        FPGrowth(min_support=0.1, validate_unique=True).fit(tx)
        raised = False
    except ValueError as e:
        raised = "unique" in str(e)
    assert raised


def test_salted_join_matches_plain(spark):
    from optimal_parallel_fp_growth_spark.functions.skew import salted_join

    # hot key 'k0' carries 80% of the big side
    big = spark.range(5000).selectExpr(
        "CASE WHEN id % 5 < 4 THEN 'k0' ELSE concat('k', id % 50) END AS key",
        "id AS payload",
    )
    small = spark.range(50).selectExpr(
        "concat('k', id) AS key", "id * 10 AS dim_val"
    )
    for how in ("inner", "left"):
        got = salted_join(big, small, "key", salt_buckets=8, how=how)
        want = big.join(small, "key", how)
        assert got.count() == want.count()
        assert (
            got.select("key", "payload", "dim_val")
            .exceptAll(want.select("key", "payload", "dim_val"))
            .count()
            == 0
        )


def test_salted_join_spreads_hot_key(spark):
    from optimal_parallel_fp_growth_spark.functions.skew import (
        deterministic_salt,
        salted_join,
    )
    from pyspark.sql import functions as F

    big = spark.range(4000).selectExpr("'hot' AS key", "id AS payload")
    # the salt column actually fans the hot key over many buckets
    salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.struct(F.col("payload"))), F.lit(8)).cast("int"),
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8

    small = spark.range(1).selectExpr("'hot' AS key", "id AS dim_val")
    got = salted_join(big, small, "key", salt_buckets=8)
    assert got.count() == 4000


def test_salted_join_rejects_unsupported_how(spark):
    import pytest as _pytest

    from optimal_parallel_fp_growth_spark.functions.skew import salted_join

    big = spark.range(10).selectExpr("'k' AS key", "id AS v")
    with _pytest.raises(ValueError):
        salted_join(big, big, "key", how="full")
