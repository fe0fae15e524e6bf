from optimal_parallel_fp_growth_spark.plans.transactions import (
    transactions_from_lineitem,
    transactions_from_events,
    transactions_from_documents,
)

__all__ = [
    "transactions_from_lineitem",
    "transactions_from_events",
    "transactions_from_documents",
]
