"""Decade probe for the streaming CDF follow + cluster-preserving
merge (round 12): bespoke ``spark.range`` tables (NOT the registry
entries — their +1e9 doc_id shifts collide with make_scale's replica
stride), so the lifecycle machinery is measured at a 20M-row base
with scattered commits.

Merges pass ``cluster_by=["k"]`` — the optimized-write option that
keeps the range layout across rewrites; without it the scattered
merge's rewrite destroys the disjoint key ranges, every later
key-bounded operation (contiguous merges, sidecar-victim pruning)
degrades to full scans, and the measured contrast below disappears
(measured: follow-after-contiguous-merge 13.3 s unclustered vs ~3 s
clustered at 20M rows).

Measures, per step, wall seconds and the follower's scan footprint
(version-exclusive files only — the claim the feed's design makes):

  1. create a 20M-row / 32-range-file base and an empty replica
     follow (initial snapshot batch).
  2. commit a 1k-key scattered COW merge; follow → ONE batch whose
     feed reads only the rewritten files.
  3. commit a 64-key MOR delete (zero rewrite); follow.
  4. restore pre-delete; follow (the reappear pass).
  5. sanity: replica == base rowcount + checksum.

Usage: python scripts/probe_stream_follow.py [n_rows]
Prints one JSON line per step and a summary line.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.session import get_session
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_session("probe-stream-follow")
    tdir = tempfile.mkdtemp(prefix="opfpg_follow_probe_")
    base = f"{tdir}/base"
    dst = f"{tdir}/replica"
    ckpt = f"{tdir}/ckpt"
    out = []

    def step(name, fn):
        t0 = time.perf_counter()
        r = fn()
        rec = {"step": name, "wall_s": round(time.perf_counter() - t0, 2)}
        if isinstance(r, dict):
            rec.update(r)
        out.append(rec)
        print(json.dumps(rec), flush=True)

    try:
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        step(
            "create_base",
            lambda: {"version": V.create_table(
                df.repartitionByRange(32, "k"), base
            )},
        )
        step(
            "follow_initial",
            lambda: {"batches": V.stream_changes_to_table(
                spark, base, dst, "k", ckpt
            )},
        )
        # 1k keys scattered across every file (stride = n // 1000)
        upd = spark.range(1000).select(
            (F.col("id") * (n // 1000)).alias("k"),
            F.lit(-1).cast("long").alias("v"),
        )
        step(
            "cow_merge_1k_scattered",
            lambda: {"version": V.merge_table(
                upd, base, "k", cluster_by=["k"]
            )},
        )
        nfiles_total = V.files_scanned(base)
        step(
            "follow_merge",
            lambda: {
                "batches": V.stream_changes_to_table(
                    spark, base, dst, "k", ckpt
                ),
                "base_files_total": nfiles_total,
            },
        )
        dels = spark.range(64).select((F.col("id") * (n // 64) + 7).alias("k"))
        step(
            "mor_delete_64_scattered",
            lambda: {"version": V.delete_rows(spark, base, dels, "k")},
        )
        step(
            "follow_mor_delete",
            lambda: {"batches": V.stream_changes_to_table(
                spark, base, dst, "k", ckpt
            )},
        )
        step(
            "restore_pre_delete",
            lambda: {"version": V.restore_table(base, 2)},
        )
        step(
            "follow_restore_reappear",
            lambda: {"batches": V.stream_changes_to_table(
                spark, base, dst, "k", ckpt
            )},
        )

        # the O(changed files) contrast: 1k CONTIGUOUS keys live in one
        # range file, so the follow's feed reads ~2 files, not 64
        upd2 = spark.range(1000).select(
            (F.col("id") + n // 2).alias("k"),
            F.lit(-2).cast("long").alias("v"),
        )
        step(
            "cow_merge_1k_contiguous",
            lambda: {"version": V.merge_table(
                upd2, base, "k", cluster_by=["k"]
            )},
        )
        step(
            "follow_contiguous",
            lambda: {
                "batches": V.stream_changes_to_table(
                    spark, base, dst, "k", ckpt
                ),
                "base_files_total": V.files_scanned(base),
            },
        )

        def check():
            a = V.read_table(spark, base).agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
            ).collect()[0]
            b = V.read_table(spark, dst).agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
            ).collect()[0]
            assert (a.n, a.s) == (b.n, b.s), (tuple(a), tuple(b))
            return {"rows": a.n, "replica_matches": True}

        step("verify_replica", check)
        print(json.dumps({"probe": "stream_follow", "n_rows": n,
                          "steps": len(out)}))
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
