"""FP-Growth frequent-itemset mining — the engine's flagship operator.

API mirrors the reference wrapper ``epfp/FPGrowth.scala:17-53``
(itemsCol / predictionCol / minSupport / minConfidence / numPartitions)
with two interchangeable kernels:

- ``kernel="mllib"`` (default): delegates to ``pyspark.ml.fpm.FPGrowth``,
  which is literally the upstream of the reference's ``pfp/`` package
  (SURVEY §0) — JVM-side PFP with map-side tree combine, the kernel we'd
  run at 100 TB.
- ``kernel="pandas"``: self-contained pure-PySpark Parallel FP-Growth
  (``applyInPandas`` grouped mining) including the reference's EPFP
  balanced partitioner (``epfp/BalancedPartitioner.scala:14-46``) —
  see operators/pfp_kernel.py.

Model outputs are canonicalized (``array_sort(items)``) so the two
kernels, the DuckDB oracle, and the reference agree modulo emission order
(SURVEY §7.4).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.rules import association_rules
from optimal_parallel_fp_growth_spark.operators.transform import transform_with_rules


class FPGrowthModel:
    """Fitted model: frequent itemsets + derived rules + transform.

    Mirrors ``epfp/FPGrowth.scala:112-165`` (model = itemsets DF +
    itemSupport + numTrainingRecords); itemSupport stays a DataFrame, not
    a driver map (100 TB stance, SURVEY §3.1).
    """

    def __init__(self, freq_itemsets: DataFrame, num_transactions: int,
                 items_col: str = "items", prediction_col: str = "prediction",
                 min_confidence: float = 0.8):
        self.freq_itemsets = freq_itemsets
        self.num_transactions = num_transactions
        self.items_col = items_col
        self.prediction_col = prediction_col
        # The estimator's minConfidence rides along on the fitted model
        # (epfp/FPGrowth.scala genericFit → .setMinConfidence), so
        # FPGrowth(min_confidence=x).fit(df).transform(df) applies x,
        # not a hard-coded default.
        self.min_confidence = min_confidence
        self._rules_cache: dict[float, DataFrame] = {}

    def association_rules(self, min_confidence: float | None = None) -> DataFrame:
        """Rules at min_confidence (default: the estimator's value this
        model was fitted with); memoized per confidence like the
        reference (epfp/FPGrowth.scala:89-107)."""
        if min_confidence is None:
            min_confidence = self.min_confidence
        if min_confidence not in self._rules_cache:
            self._rules_cache[min_confidence] = association_rules(
                self.freq_itemsets, self.num_transactions, min_confidence
            ).cache()
        return self._rules_cache[min_confidence]

    def transform(self, dataset: DataFrame, min_confidence: float | None = None,
                  keep_array: bool = True) -> DataFrame:
        """Reference-parity prediction (epfp/FPGrowth.scala:123-150)."""
        return transform_with_rules(
            dataset,
            self.association_rules(min_confidence),
            items_col=self.items_col,
            prediction_col=self.prediction_col,
            keep_array=keep_array,
        )

    def unpersist(self) -> None:
        """Release everything this model pinned in executor storage —
        the frequent-itemsets DataFrame (persisted by fit()) and every
        memoized rules DataFrame. Call when done with the model in a
        long-lived session; without it, Spark's LRU eviction is the
        only cleanup."""
        for df in self._rules_cache.values():
            df.unpersist()
        self._rules_cache.clear()
        self.freq_itemsets.unpersist()

    def transform_self(self, min_confidence: float | None = None,
                       keep_array: bool = True) -> DataFrame:
        """The reference's ``transform(spark)`` demo overload
        (pfp/FPGrowth.scala:124-148): predict over the DISTINCT
        antecedents of the mined rules themselves — each rule
        antecedent becomes an input basket, answered with the standard
        rule application. The reference round-trips the collected
        rules through ``makeRDD(...).toDF``; we stay on the rules
        DataFrame (already bounded) and reuse the declarative
        transform."""
        rules = self.association_rules(min_confidence)
        baskets = rules.select(F.col("antecedent").alias(self.items_col)).distinct()
        return transform_with_rules(
            baskets,
            rules,
            items_col=self.items_col,
            prediction_col=self.prediction_col,
            keep_array=keep_array,
        )


class FPGrowth:
    """Estimator. Parameters and defaults follow epfp/FPGrowth.scala:19-27
    and epfp/FPGrowthCore.scala:27-44."""

    def __init__(
        self,
        items_col: str = "items",
        prediction_col: str = "prediction",
        min_support: float = 0.3,
        min_confidence: float = 0.8,
        num_partitions: int | None = None,
        kernel: str = "mllib",
        balanced: bool = True,
        validate_unique: bool = False,
    ):
        if not 0.0 <= min_support <= 1.0:
            raise ValueError(f"minSupport must be in [0,1] but got {min_support}")
        if not 0.0 <= min_confidence <= 1.0:
            raise ValueError(f"minConfidence must be in [0,1] but got {min_confidence}")
        if num_partitions is not None and num_partitions <= 0:
            raise ValueError(f"numPartitions must be positive but got {num_partitions}")
        if kernel not in ("mllib", "pandas"):
            raise ValueError(f"kernel must be 'mllib' or 'pandas', got {kernel!r}")
        self.items_col = items_col
        self.prediction_col = prediction_col
        self.min_support = min_support
        self.min_confidence = min_confidence
        self.num_partitions = num_partitions
        self.kernel = kernel
        self.balanced = balanced
        # The reference validates uniqueness unconditionally inside item
        # counting (epfp/FPGrowthCore.scala:77-81); we make the check
        # opt-in because it costs one extra pass over the input, which a
        # caller who already array_distinct'ed their baskets shouldn't pay.
        self.validate_unique = validate_unique

    def min_count(self, n: int) -> int:
        """minCount = ceil(minSupport · N) — epfp/FPGrowthCore.scala:54."""
        return int(math.ceil(self.min_support * n))

    def fit(self, dataset: DataFrame) -> FPGrowthModel:
        """Mine frequent itemsets (epfp/FPGrowth.scala:55-80 lifecycle):
        project the items column, drop null baskets, count N, mine."""
        items = (
            dataset.select(F.col(self.items_col).alias("items"))
            .where(F.col("items").isNotNull())
        )
        items.persist()
        try:
            if self.validate_unique:
                from optimal_parallel_fp_growth_spark.functions.arrays import (
                    validate_unique_items,
                )

                validate_unique_items(items, "items")
            n = items.count()
            if self.kernel == "mllib":
                freq = self._fit_mllib(items)
            else:
                from optimal_parallel_fp_growth_spark.operators.pfp_kernel import mine_pandas

                freq = mine_pandas(
                    items,
                    min_count=self.min_count(n),
                    num_partitions=self.num_partitions,
                    balanced=self.balanced,
                )
            # Canonical order for cross-kernel/oracle comparability.
            freq = freq.select(F.array_sort("items").alias("items"), "freq")
            freq.persist().count()  # materialize before unpersisting input
        finally:
            items.unpersist()
        return FPGrowthModel(
            freq, n, self.items_col, self.prediction_col, self.min_confidence
        )

    def _fit_mllib(self, items: DataFrame) -> DataFrame:
        from pyspark.ml.fpm import FPGrowth as MLlibFPGrowth

        est = MLlibFPGrowth(
            itemsCol="items",
            minSupport=self.min_support,
            minConfidence=self.min_confidence,
        )
        if self.num_partitions is not None:
            est.setNumPartitions(self.num_partitions)
        return est.fit(items).freqItemsets
