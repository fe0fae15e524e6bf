"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (FP-Growth fit → association
rules) on sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: mine events user-day baskets at sf0.001, return the
    association rules (antecedent, consequent, confidence, lift, support)."""
    from optimal_parallel_fp_growth_spark.queries import q_assoc_rules

    return q_assoc_rules(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from optimal_parallel_fp_growth_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from optimal_parallel_fp_growth_spark.queries import ORACLES

    return dict(ORACLES)
