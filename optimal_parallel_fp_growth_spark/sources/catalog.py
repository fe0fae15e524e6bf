"""Parquet catalog over the driver test tables.

The reference's only source is a text-file scan
(``epfp/EPFP.scala:26-27``); our engine additionally reads the columnar
test tables. Parquet scans go through Spark's DataSource V2 path, so
filter pushdown / column pruning / partition pruning are free — keep all
per-table projection in the query, never pre-collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Column pruning/pushdown happen at the scan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
