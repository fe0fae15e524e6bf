"""PySpark-native analytics engine with the capabilities of
Radeity/optimal-parallel-fp-growth (frequent-itemset + association-rule
mining), rebuilt Spark-first (DataFrame/SQL/Catalyst), plus the
LLM-data-pipeline operators a 100 TB training-data pipeline needs
(dedup, similarity search, text analysis, multimodal plumbing).

Reference parity citations use paths relative to /root/reference/.
"""

from optimal_parallel_fp_growth_spark.session import get_session
from optimal_parallel_fp_growth_spark.operators.fpgrowth import FPGrowth, FPGrowthModel

__all__ = ["get_session", "FPGrowth", "FPGrowthModel"]

__version__ = "0.1.0"
