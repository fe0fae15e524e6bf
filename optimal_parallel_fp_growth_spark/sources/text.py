"""Text-file basket source — parity with the reference's loader.

Reference: ``epfp/EPFP.scala:26-27`` reads a text file and maps each line
``t => t.split(" ").distinct`` into an ``items`` column. We express the
same thing declaratively so it stays inside whole-stage codegen:
``spark.read.text`` → ``array_distinct(split(...))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_baskets_text(spark: SparkSession, path: str, items_col: str = "items") -> DataFrame:
    """One line = one basket; tokens split on ' ', deduped within the line."""
    return spark.read.text(path).select(
        F.array_distinct(F.split(F.col("value"), " ")).alias(items_col)
    )


def baskets_from_text_column(df: DataFrame, text_col: str = "text", items_col: str = "items") -> DataFrame:
    """Same tokenize+distinct over an existing string column (e.g. documents.text)."""
    return df.withColumn(items_col, F.array_distinct(F.split(F.col(text_col), " ")))
