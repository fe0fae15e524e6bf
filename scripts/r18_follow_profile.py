"""Per-phase profile of the versioned_stream_follow bench stage at
sf0.1 — splits the timed lifecycle into its commits, the 5-batch
follow, and the final aggregate so optimization targets the real cost
(round 18). Usage: python scripts/r18_follow_profile.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    import os
    import tempfile

    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.queries_docs import (
        VERSIONED_CDF_DELETE_BELOW,
    )
    from optimal_parallel_fp_growth_spark.session import get_session
    from optimal_parallel_fp_growth_spark.sources import versioned as V
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("r18-follow-profile")
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    docs.count()  # session warm-up outside the timers

    t = {}

    def step(name, fn):
        t0 = time.perf_counter()
        r = fn()
        t[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {t[name]:.3f}s", flush=True)
        return r

    for rep in range(3):
        tdir = tempfile.mkdtemp(prefix="opfpg_r18_follow_")
        base = os.path.join(tdir, "base")
        dst = os.path.join(tdir, "replica")
        ckpt = os.path.join(tdir, "ckpt")
        print(f"rep {rep}:")
        step("create", lambda: V.create_table(
            docs.repartitionByRange(4, "doc_id"), base))
        step("merge", lambda: V.merge_table(
            docs.where(F.col("doc_id") % 10 == 0).select(
                "doc_id", "lang", F.lit(-5).cast("long").alias("n_chars")
            ), base, "doc_id"))
        step("delete1", lambda: V.delete_rows(
            spark, base,
            docs.where(F.col("doc_id") % 7 == 3).select("doc_id"),
            "doc_id"))
        step("restore", lambda: V.restore_table(base, 2))
        step("delete2", lambda: V.delete_rows(
            spark, base,
            docs.where(
                F.col("doc_id") < VERSIONED_CDF_DELETE_BELOW
            ).select("doc_id"), "doc_id"))
        n = step("follow_5_batches", lambda: V.stream_changes_to_table(
            spark, base, dst, "doc_id", ckpt))
        assert n == 5, n
        step("final_agg", lambda: V.read_table(spark, dst)
             .groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("total_chars"))
             .write.format("noop").mode("overwrite").save())
        total = sum(t.values())
        print(f"  total: {total:.3f}s")


if __name__ == "__main__":
    main()
