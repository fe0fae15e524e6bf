"""Per-query JOB-level profiler (r17): run registry queries in
isolation and attribute wall time to the individual Spark jobs each
query launches (REST /jobs delta), plus gaps (driver/planning time).

Usage:
    python scripts/r17_profile.py SF_DIR query [query ...]

For each query prints one JSON line:
    {"query": ..., "sec": wall, "n_jobs": N, "job_sec": sum of job walls,
     "gap_sec": wall - job_sec, "jobs": [[desc, sec, nstages, ntasks], ...]}

Each query runs twice; the second (warm) run is reported — cold-run JIT
and page-cache effects otherwise dominate single-query walls.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4050"))


def _jobs() -> list[dict]:
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/jobs", timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = sys.argv[1].rstrip("/")
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    from optimal_parallel_fp_growth_spark.functions.caching import (
        release_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.queries import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("r17-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from datetime import datetime

    def ts(s: str) -> float:
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    for name in names:
        q = QUERIES[name]
        for attempt in ("cold", "warm"):
            seen = {j["jobId"] for j in _jobs()}
            t0 = time.perf_counter()
            out = q(spark, sf_dir)
            t_build = time.perf_counter() - t0
            out.write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 3)
            release_cached_inputs(out)
            new = [j for j in _jobs() if j["jobId"] not in seen]
            new.sort(key=lambda j: j["jobId"])
            jobs = []
            job_sec = 0.0
            for j in new:
                dur = 0.0
                if j.get("submissionTime") and j.get("completionTime"):
                    dur = round(ts(j["completionTime"]) - ts(j["submissionTime"]), 3)
                job_sec += dur
                desc = (j.get("description") or j.get("name") or "")[:90]
                jobs.append([desc, dur, len(j.get("stageIds", [])), j.get("numTasks", 0)])
            print(
                json.dumps(
                    {
                        "query": name,
                        "run": attempt,
                        "sec": sec,
                        "build_sec": round(t_build, 3),
                        "n_jobs": len(new),
                        "job_sec": round(job_sec, 3),
                        "gap_sec": round(sec - job_sec, 3),
                        "jobs": jobs,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
