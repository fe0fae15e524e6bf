"""Prefix-filter crossover probe on a Zipfian corpus (VERDICT r5 task
#8). The round-5 dense-vocab probe refuted `ngram_jaccard_prefix` by
construction (931 hot shingles, no rare tail); this probe measures it
on the corpus shape it was designed for — Zipf-1 tokens, vocabulary
growing with corpus size (scripts/make_zipf_corpus.py) — against the
all-postings exact tier (`ngram_jaccard_pairs(max_df=0)`), checking
bit-for-bit result equality at every size and recording wall +
shuffle + spill so the crossover (if any) is a measured number, not a
theory.

Usage:
    python scripts/zipf_prefix_probe.py [sizes ...]   # default 2000 5000 10000 20000
    python scripts/zipf_prefix_probe.py --prefix-only [sizes ...]
Prints one JSON line per (size, tier) and a summary line.
``--prefix-only`` skips the exact tier — for sizes where its df² pair
blowup no longer fits the probe heap (measured: GCLocker alloc failure
at 20 k docs / 8 g driver) and the comparison would just crash.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, functions as F

from scripts.make_zipf_corpus import zipf_documents

UI_PORT = 4051
TAU = 0.8


def _stage_totals() -> dict[str, int]:
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10) as r:
        stages = json.load(r)
    tot = {"shuffle_write": 0, "spill_disk": 0}
    for s in stages:
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["spill_disk"] += s.get("diskBytesSpilled", 0)
    return tot


def main() -> None:
    args = sys.argv[1:]
    prefix_only = "--prefix-only" in args
    sizes = [int(a) for a in args if not a.startswith("--")] or [
        2000, 5000, 10000, 20000,
    ]
    spark = (
        SparkSession.builder.appName("zipf-prefix-probe")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    from optimal_parallel_fp_growth_spark.functions.caching import (
        release_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.operators import dedup

    results = []
    for n in sizes:
        docs = zipf_documents(spark, n)
        docs.persist()
        docs.count()
        row: dict = {"n_docs": n}
        outs = {}
        tiers = [
            ("exact_postings", lambda d: dedup.ngram_jaccard_pairs(
                d, k=2, threshold=TAU, max_df=0)),
            ("prefix", lambda d: dedup.ngram_jaccard_prefix(
                d, k=2, threshold=TAU)),
        ]
        if prefix_only:
            tiers = tiers[1:]
        for tier, fn in tiers:
            before = _stage_totals()
            t0 = time.perf_counter()
            out = fn(docs)
            rows = sorted(tuple(r) for r in out.collect())
            sec = round(time.perf_counter() - t0, 2)
            release_cached_inputs(out)
            after = _stage_totals()
            outs[tier] = rows
            row[tier] = {
                "sec": sec,
                "pairs": len(rows),
                "shuffle_mb": round(
                    (after["shuffle_write"] - before["shuffle_write"]) / 1e6, 1
                ),
                "spill_mb": round(
                    (after["spill_disk"] - before["spill_disk"]) / 1e6, 1
                ),
            }
        if not prefix_only:
            row["equal"] = outs["exact_postings"] == outs["prefix"]
        docs.unpersist()
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"tau": TAU, "runs": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
