"""Per-batch breakdown of the CDF follow loop (round 18): replicates
stream_changes_to_table's apply with timers around (a) changeset
materialization (persist+count — carries the feed's full-outer join),
(b) merge_table (bounds agg over cached blocks + rewrite write +
commit), so the ~1.3 s/batch cost is attributed before engineering.

Usage: python scripts/r18_follow_batch_profile.py [sf_dir]
"""

from __future__ import annotations

import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.queries_docs import (
        VERSIONED_CDF_DELETE_BELOW,
    )
    from optimal_parallel_fp_growth_spark.session import get_session
    from optimal_parallel_fp_growth_spark.sources import versioned as V
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("r18-follow-batch")
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    docs.count()

    for rep in range(2):
        tdir = tempfile.mkdtemp(prefix="opfpg_r18_fb_")
        base = os.path.join(tdir, "base")
        dst = os.path.join(tdir, "replica")
        ckpt = os.path.join(tdir, "ckpt")
        V.create_table(docs.repartitionByRange(4, "doc_id"), base)
        V.merge_table(
            docs.where(F.col("doc_id") % 10 == 0).select(
                "doc_id", "lang", F.lit(-5).cast("long").alias("n_chars")
            ), base, "doc_id")
        V.delete_rows(
            spark, base,
            docs.where(F.col("doc_id") % 7 == 3).select("doc_id"), "doc_id")
        V.restore_table(base, 2)
        V.delete_rows(
            spark, base,
            docs.where(F.col("doc_id") < VERSIONED_CDF_DELETE_BELOW)
            .select("doc_id"), "doc_id")

        print(f"rep {rep}:", flush=True)

        def apply(batch, version):
            t0 = time.perf_counter()
            changes = batch.where(F.col("_change_type") != "update_preimage")
            cols = [c for c in changes.columns if c != "_change_type"]
            src = changes.select(
                *cols,
                (F.col("_change_type") == "delete").alias("__cdc_delete"),
            ).dropDuplicates(["doc_id"]).persist()
            n = src.count()
            t1 = time.perf_counter()
            try:
                try:
                    V.merge_table(
                        src, dst, "doc_id",
                        delete_col="__cdc_delete", empty_ok=True)
                except FileNotFoundError:
                    live = src.where(~F.col("__cdc_delete")).drop(
                        "__cdc_delete")
                    V.create_table(live, dst)
                t2 = time.perf_counter()
            finally:
                src.unpersist()
            print(
                f"  v{version}: rows={n} build+materialize="
                f"{t1 - t0:.3f}s merge={t2 - t1:.3f}s",
                flush=True,
            )

        t0 = time.perf_counter()
        V.stream_table_changes(spark, base, "doc_id", ckpt, apply)
        print(f"  follow total: {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
