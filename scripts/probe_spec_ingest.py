"""Round-15 decade probe: partition-spec evolution + exactly-once
streaming ingest at the 20M-row tier (the 100x-design evidence the
scale gate asks for — sf0.1 correctness runs are ~2M rows/table).

Steps (bespoke spark.range tables, local[32] by default):
  1. create a 20M-row table hash-bucketed k%32
  2. one-file equality probe (old spec)
  3. evolve_table_spec -> 64 buckets  [THE metadata-only claim: ~ms]
  4. append 2M new-era rows
  5. one-file probes on BOTH eras
  6. merge 1k scattered keys (old-era files must rewrite = migrate)
  7. stream-ingest 5 x 400k-row micro-batches (availableNow) into a
     fresh table, then REPLAY the whole stream from a lost checkpoint
     under the same app_id: row count must not move (exactly-once)

Prints one JSON line per step and a summary line.
Usage: python scripts/probe_spec_ingest.py [n_rows]
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.session import get_session
from optimal_parallel_fp_growth_spark.sources import versioned as V

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = get_session("probe_spec_ingest", CPUS)
tdir = tempfile.mkdtemp(prefix="opfpg_probe_spec_")
out: dict[str, float] = {}


def step(name):
    def run(fn):
        t0 = time.time()
        extra = fn() or {}
        wall = round(time.time() - t0, 3)
        out[name] = wall
        print(json.dumps({"step": name, "sec": wall, **extra}), flush=True)

    return run


def rows(start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


tbl = f"{tdir}/tbl"

try:
    @step("create_20m_bucketed32")
    def _():
        V.create_table(rows(0, N), tbl, bucket_by=("k", 32))

    @step("probe_old_spec")
    def _():
        opened = V.files_scanned(tbl, prune=("k", "==", N // 3))
        got = (
            V.read_table(spark, tbl, prune=("k", "==", N // 3))
            .where(F.col("k") == N // 3)
            .count()
        )
        assert got == 1, got
        return {"files_opened": opened}

    @step("evolve_spec_to_64")
    def _():
        V.evolve_table_spec(tbl, bucket_by=("k", 64))

    @step("append_2m_new_era")
    def _():
        V.append_table(rows(N, N // 10), tbl)

    @step("probe_both_eras")
    def _():
        o_old = V.files_scanned(tbl, prune=("k", "==", N // 3))
        o_new = V.files_scanned(tbl, prune=("k", "==", N + N // 20))
        for probe in (N // 3, N + N // 20):
            got = (
                V.read_table(spark, tbl, prune=("k", "==", probe))
                .where(F.col("k") == probe)
                .count()
            )
            assert got == 1, (probe, got)
        return {"files_old_era": o_old, "files_new_era": o_new}

    @step("merge_1k_scattered")
    def _():
        changes = spark.range(0, 1000).select(
            (F.col("id") * (N // 1000)).alias("k"),
            F.lit(-1).cast("long").alias("v"),
        )
        V.with_retry(lambda: V.merge_table(changes, tbl, "k"))
        got = (
            V.read_table(spark, tbl, prune=("k", "==", 0))
            .where(F.col("k") == 0)
            .first()
        )
        assert got.v == -1

    feed = f"{tdir}/feed"
    ing = f"{tdir}/ing"

    @step("write_feed_5x400k")
    def _():
        for i in range(5):
            rows(i * 400_000, 400_000).coalesce(1).write.mode(
                "append"
            ).parquet(feed)

    def _stream():
        return (
            spark.readStream.schema("k long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )

    @step("stream_ingest_2m")
    def _():
        V.stream_ingest_to_table(
            _stream(), ing, f"{tdir}/ck1", app_id="probe"
        ).awaitTermination()
        n = V.table_rowcount(ing)
        assert n == 2_000_000, n
        return {"versions": len(V.table_history(ing))}

    @step("full_replay_lost_checkpoint")
    def _():
        V.stream_ingest_to_table(
            _stream(), ing, f"{tdir}/ck2", app_id="probe"
        ).awaitTermination()
        n = V.table_rowcount(ing)
        assert n == 2_000_000, n  # exactly-once under total replay
        return {"versions": len(V.table_history(ing))}

    print(json.dumps({"summary": out, "n_rows": N}), flush=True)
finally:
    shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()
