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
        # InferFiltersFromGenerate infers `size(x)>0 AND isnotnull(x)`
        # from every explode(x), and predicate pushdown then SUBSTITUTES
        # x's defining expression below the exchange — for this engine's
        # signature pattern (explode over a derived shingle/token array)
        # that re-computes the tokenize→shingle chain 3× per row (twice
        # in the pushed filter, once in the projection), in the SCAN
        # stage. Measured r17: decontaminate 8.2 s → 2.3 s at sf0.1 with
        # the rule excluded; at 100 TB the duplication is pure CPU waste
        # on the hottest expression. The rule only ever prunes rows that
        # explode() would drop anyway (no result change), and none of
        # its inferred predicates are parquet-pushable here (guide §4.4:
        # stop the optimizer duplicating expensive expressions).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Python workers fork from a per-executor daemon; pre-importing
        # pandas/numpy/pyarrow IN the daemon (opfpg_daemon_preload.py,
        # a repo-root module so ``python -m`` never executes the heavy
        # engine package __init__) makes every forked worker inherit
        # them via copy-on-write instead of paying the ~1 s import
        # chain per worker on its first Arrow batch (VERDICT r17 task
        # #6 — the measured floor of a session's first Arrow stage).
        # OPFPG_DAEMON_PRELOAD=0 opts out (and restores the stock
        # daemon) for A/B.
        .config(
            "spark.python.daemon.module",
            "opfpg_daemon_preload"
            if os.environ.get("OPFPG_DAEMON_PRELOAD", "1") != "0"
            else "pyspark.daemon",
        )
        # the daemon module must be importable by the worker python
        # regardless of the launch directory
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                filter(
                    None,
                    [
                        os.path.dirname(
                            os.path.dirname(os.path.abspath(__file__))
                        ),
                        os.environ.get("PYTHONPATH"),
                    ],
                )
            ),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
