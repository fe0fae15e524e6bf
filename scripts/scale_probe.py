"""Scale probe: run registry queries at a given sf dir, recording wall
seconds AND shuffle bytes per query (VERDICT r3 task #4 — the evidence
the 100×-design claims need beyond sf0.1 wall time alone).

Shuffle/spill numbers come from the Spark UI REST API on the local
driver (enabled just for this script; the engine session keeps it off):
per-query deltas of stage-level shuffleWrite/shuffleRead/spill sums.
Queries run under the same protocol as bench.py: noop-sink force, then
``release_cached_inputs``.

Usage:
    python scripts/scale_probe.py SF_DIR [query ...]
Prints one JSON line per query and a final summary JSON line.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

DEFAULT_QUERIES = (
    "supplier_pagerank",
    "supplier_pagerank_bucketed",
    "dedup_clusters",
    "kmeans_clusters",
    "kmeans_auto",
    "semdedup",
    "dedup_minhash_lsh",
    "tfidf_top_terms",
)

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4050"))


def _stage_totals() -> dict[str, int]:
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10) as r:
        stages = json.load(r)
    tot = {"shuffle_write": 0, "shuffle_read": 0, "spill_disk": 0, "input": 0}
    for s in stages:
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["spill_disk"] += s.get("diskBytesSpilled", 0)
        tot["input"] += s.get("inputBytes", 0)
    return tot


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    sf_dir = sys.argv[1].rstrip("/")
    names = sys.argv[2:] or list(DEFAULT_QUERIES)

    from pyspark.sql import SparkSession

    from optimal_parallel_fp_growth_spark.functions.caching import (
        release_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.queries import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Initial shuffle-partition count. AQE only coalesces DOWN from this,
    # so at 10×–100× data the default (=cores) makes partitions outgrow
    # executor memory and sort-spill; set SPARK_GRAFT_SHUFFLE_PARTS
    # higher (the set-high-let-AQE-coalesce recipe a cluster deploy uses).
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    spark = (
        SparkSession.builder.appName("scale-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    results: dict[str, dict] = {}
    for name in names:
        q = QUERIES[name]
        before = _stage_totals()
        t0 = time.perf_counter()
        out = q(spark, sf_dir)
        out.write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 3)
        release_cached_inputs(out)
        after = _stage_totals()
        row = {
            "sec": sec,
            **{k: after[k] - before[k] for k in after},
        }
        results[name] = row
        print(json.dumps({"query": name, **row}), flush=True)
    print(
        json.dumps(
            {"sf_dir": sf_dir, "cpus": cpus, "queries": results}
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
