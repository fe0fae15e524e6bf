"""Decade probe for writer-side commit stats (round 16, VERDICT r15
task #2): a 20M-row, 64-file bloom-column commit, timing

* the WRITE job alone (no bloom spec — footer stats only),
* the full commit with the DISTRIBUTED stats pass (the shipped path:
  per-file __nan/__bloom computed in a Spark job),
* the sequential DRIVER loop over the same files (the pre-r16 path,
  re-run via ``_file_stats(..., spark=None)``),

plus the BPE memo before/after (VERDICT r15 task #6) on a Zipfian
corpus. Evidence target: commit wall bounded by the write job, not a
driver hash loop.

Usage:
    python scripts/probe_commit_stats.py [rows] [files]
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def main() -> None:
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.session import get_session
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    spark = get_session("probe-commit-stats")
    tdir = tempfile.mkdtemp(prefix="probe_stats_")
    out: dict = {"rows": ROWS, "files": FILES}
    try:
        df = spark.range(ROWS).select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("h"),
            (F.col("id") / 7.0).alias("x"),
        ).repartition(FILES)
        df.count()  # warm the input plan

        t0 = time.time()
        V.create_table(df, f"{tdir}/plain")
        out["write_plus_footer_stats_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        V.create_table(df, f"{tdir}/bloom", bloom_cols=["h"])
        out["commit_distributed_stats_s"] = round(time.time() - t0, 2)

        man = V._load_manifest(f"{tdir}/bloom", 1)
        spec = V._table_spec(f"{tdir}/bloom")
        t0 = time.time()
        driver_stats = V._file_stats(
            f"{tdir}/bloom", man["files"], bloom_spec=spec.get("bloom"),
            spark=None,
        )
        out["driver_loop_stats_s"] = round(time.time() - t0, 2)
        assert driver_stats == man["file_stats"], "paths diverged"
        ms = {
            st["__bloom"]["h"]["m"]
            for st in man["file_stats"].values()
            if "__bloom" in st
        }
        out["bloom_files"] = sum(
            1 for st in man["file_stats"].values() if "__bloom" in st
        )
        out["auto_widths"] = sorted(ms)
        out["skip_absent"] = V.files_scanned(
            f"{tdir}/bloom",
            prune=("h", "==", "0123456789abcdef0123456789abcdef"),
        )

        # ---- BPE memo before/after on a Zipfian corpus ----
        from optimal_parallel_fp_growth_spark.operators.bpe import (
            apply_bpe,
            train_bpe,
        )
        from optimal_parallel_fp_growth_spark.sources.catalog import (
            load_table,
        )

        sf = "/root/testdata/sf0.1"
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        docs.persist().count()
        merges = train_bpe(docs, num_merges=50, top_words=5000)
        for label, memo in (("bpe_uncached_s", False), ("bpe_memo_s", True)):
            t0 = time.time()
            apply_bpe(docs, merges, memoize=memo).write.format("noop").mode(
                "overwrite"
            ).save()
            out[label] = round(time.time() - t0, 2)
        docs.unpersist()
        print(json.dumps(out))
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
