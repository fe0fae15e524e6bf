"""Round-14 20M-row probes: the scale arithmetic behind purge_deletes,
compact_table(where=), sorted buckets, and metadata-only schema DDL.

Usage: python scripts/probe_r14.py [rows]  (default 20_000_000)
Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.session import get_session
from optimal_parallel_fp_growth_spark.sources import versioned as V

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
BASE = pathlib.Path("/tmp/r14probe")


def out(**kw):
    print(json.dumps(kw), flush=True)


def main():
    spark = get_session("r14-probe")
    if BASE.exists():
        shutil.rmtree(BASE)
    BASE.mkdir()

    # ---- A: purge_deletes — clustered deletes vs scattered ----------
    p = str(BASE / "purge_a")
    df = spark.range(ROWS).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    V.create_table(df.repartitionByRange(64, "k"), p)
    # 64 keys inside ONE narrow range (2 files at most)
    keys = spark.range(1000, 1064).select(F.col("id").alias("k"))
    V.delete_rows(spark, p, keys, "k")
    before = set(V._load_manifest(p, 2)["files"])
    t0 = time.perf_counter()
    v = V.purge_deletes(spark, p)
    wall = time.perf_counter() - t0
    after = set(V._load_manifest(p, v)["files"])
    out(probe="purge_clustered_keys", rows=ROWS, files=len(before),
        rewritten=len(before - after), wall_s=round(wall, 2))

    p2 = str(BASE / "purge_b")
    V.create_table(df.repartitionByRange(64, "k"), p2)
    stride = ROWS // 64
    scattered = spark.range(64).select((F.col("id") * stride + 17).alias("k"))
    V.delete_rows(spark, p2, scattered, "k")
    before = set(V._load_manifest(p2, 2)["files"])
    t0 = time.perf_counter()
    v = V.purge_deletes(spark, p2)
    wall = time.perf_counter() - t0
    after = set(V._load_manifest(p2, v)["files"])
    out(probe="purge_scattered_keys", rows=ROWS, files=len(before),
        rewritten=len(before - after), wall_s=round(wall, 2))

    # ---- B: partial compact — fold the hot tail ---------------------
    p3 = str(BASE / "pcomp")
    V.create_table(df.repartitionByRange(64, "k"), p3)
    for i in range(20):  # 20 tiny "streaming" appends past the key space
        V.append_table(
            spark.range(ROWS + i * 1000, ROWS + i * 1000 + 1000).select(
                F.col("id").alias("k"), (F.col("id") % 97).alias("v")
            ).coalesce(1),
            p3,
        )
    man = V._load_manifest(p3, 21)
    before = set(man["files"])
    t0 = time.perf_counter()
    v = V.compact_table(spark, p3, where=("k", ">=", ROWS))
    wall = time.perf_counter() - t0
    man2 = V._load_manifest(p3, v)
    out(probe="partial_compact_hot_tail", rows=ROWS,
        files_before=len(before), files_after=len(man2["files"]),
        carried=len(before & set(man2["files"])), wall_s=round(wall, 2))
    t0 = time.perf_counter()
    n = V.read_table(spark, p3).count()
    out(probe="partial_compact_readback", rows=n,
        wall_s=round(time.perf_counter() - t0, 2))

    # ---- C: sorted buckets — two-predicate lookup -------------------
    p4 = str(BASE / "sbkt")
    src = spark.range(ROWS).select(
        F.concat(F.lit("s"), (F.col("id") % 1000).cast("string")).alias(
            "src"
        ),
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("v"),
    )
    t0 = time.perf_counter()
    V.create_table(
        src, p4, bucket_by=("src", 16),
        sort_within_buckets=["doc_id"], bucket_file_rows=100_000,
    )
    build = time.perf_counter() - t0
    total = V.files_scanned(p4)
    bucket_only = V.files_scanned(p4, prune=("src", "==", "s123"))
    preds = [("src", "==", "s123"), ("doc_id", ">=", 500_000),
             ("doc_id", "<", 600_000)]
    both = V.files_scanned(p4, prune=preds)
    t0 = time.perf_counter()
    got = V.read_table(spark, p4, prune=preds).count()
    lookup = time.perf_counter() - t0
    out(probe="sorted_bucket_lookup", rows=ROWS, build_s=round(build, 2),
        files_total=total, bucket_only=bucket_only, two_pred=both,
        lookup_rows=got, lookup_s=round(lookup, 2))

    # ---- D: schema DDL is O(1) in table size ------------------------
    t0 = time.perf_counter()
    V.rename_column(p4, "v", "val")
    rn = time.perf_counter() - t0
    t0 = time.perf_counter()
    V.add_column(p4, "quality", "double")
    ad = time.perf_counter() - t0
    mm = V.table_minmax(p4, "doc_id")
    out(probe="schema_ddl_20m", rename_s=round(rn, 3),
        add_column_s=round(ad, 3), minmax=mm)
    spark.stop()
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
