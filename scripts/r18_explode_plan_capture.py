"""Capture before/after plans for the trade-graph symmetrization (r18).

The 'before' shape (union of cs and its reversal) is reconstructed
inline from the committed HEAD body so the capture needs no stash;
the 'after' is the live `_supplier_trade_graph`. Explain-only — no
execution — so it can run alongside other jobs.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from optimal_parallel_fp_growth_spark.functions.layout import fan_out_scan
    from optimal_parallel_fp_growth_spark.queries_relational import (
        _supplier_trade_graph,
    )
    from optimal_parallel_fp_growth_spark.session import get_session
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.1"
    out = pathlib.Path("plans/r18")
    spark = get_session("r18-explode-capture", 8)

    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = fan_out_scan(
        load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
        "l_orderkey",
    )
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    before = cs.union(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    (out / "supplier_pagerank_explode_before.txt").write_text(
        before._sc._jvm.PythonSQLUtils.explainString(
            before._jdf.queryExecution(), "formatted"
        )
    )
    after = _supplier_trade_graph(spark, sf)
    (out / "supplier_pagerank_explode_after.txt").write_text(
        after._sc._jvm.PythonSQLUtils.explainString(
            after._jdf.queryExecution(), "formatted"
        )
    )
    print("captured")
    spark.stop()


if __name__ == "__main__":
    main()
