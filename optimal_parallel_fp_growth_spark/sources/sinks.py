"""File sinks — absent from the reference (its only sink is
collect()+println, SURVEY §2.1), but mandatory for a real engine.

Thin, opinionated wrappers over ``df.write``: parquet is the default
interchange format (columnar, statistics, predicate-pushdown-able on
re-read); ``partition_by`` turns a write into a hive-layout table so
downstream scans get partition pruning — the 100 TB pattern where e.g.
events are laid out by day and a day-ranged query touches 1/365th of
the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with header; arrays/structs are not CSV-representable — cast
    or json-encode them first."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_back(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    reader = spark.read
    if fmt == "csv":
        return reader.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt == "json":
        return reader.json(path)
    return reader.parquet(path)
