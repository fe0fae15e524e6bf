"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the config block is the
one we'd ship to a 1000-executor cluster (AQE on, adaptive skew handling,
Arrow for the few pandas-UDF paths). Nothing here is machine-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "opfpg-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Scale stance: every knob below is sizing-relative, not absolute —
    AQE coalesces the 32 test shuffle partitions locally and would
    re-split/skew-join on a real cluster; ``maxPartitionBytes`` keeps scan
    tasks ~128 MB so a 100 TB input fans out to ~800k tasks instead of
    overloading a few.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
