from optimal_parallel_fp_growth_spark.operators.fpgrowth import FPGrowth, FPGrowthModel

__all__ = ["FPGrowth", "FPGrowthModel"]
