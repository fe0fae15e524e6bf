"""Parquet catalog over the driver test tables.

The reference's only source is a text-file scan
(``epfp/EPFP.scala:26-27``); our engine additionally reads the columnar
test tables. Parquet scans go through Spark's DataSource V2 path, so
filter pushdown / column pruning / partition pruning are free — keep all
per-table projection in the query, never pre-collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

# The driver's parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
# Spark's vectorized reader rejects by default. We read them as long via
# the legacy conf and rebuild proper (µs) timestamp columns. Integer
# `div` keeps full precision (float division would lose low bits of an
# int64 nanosecond value).
_NANO_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test table. Column pruning/pushdown happen at the scan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
