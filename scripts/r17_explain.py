"""Capture .explain('formatted') output for registry queries (r17).

Usage:
    python scripts/r17_explain.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query (default: a
curated hot-stage list). Lifecycle queries execute their side-effecting
setup when the callable builds the DataFrame — that is expected; the
captured plan is the plan of the RETURNED frame, exactly what the bench
times with the noop sink.
"""

from __future__ import annotations

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Hot stages by quiet-run cost (BASELINE.md round-16 closing state).
DEFAULT_QUERIES = [
    "supplier_pagerank",
    "supplier_pagerank_bucketed",
    "semdedup",
    "semdedup_auto",
    "knn_ivf",
    "knn_ivf_index",
    "kmeans_auto",
    "freq_itemsets_by_lang",
    "freq_itemsets_pfp",
    "deduped_corpus_cc",
    "deduped_corpus",
    "dedup_clusters",
    "dedup_incremental",
    "decontaminate",
    "dedup_minhash_lsh",
    "multimodal_frames",
    "curate_corpus",
    "events_resample",
    "dedup_simhash",
    "dedup_lines",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    os.makedirs(outdir, exist_ok=True)

    from optimal_parallel_fp_growth_spark.functions.caching import (
        release_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.queries import QUERIES
    from optimal_parallel_fp_growth_spark.session import get_session

    spark = get_session("opfpg-r17-explain")
    for name in names:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"explain: {name}")
        try:
            df = q(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            release_cached_inputs(df)
        except Exception as e:  # noqa: BLE001 — capture harness boundary
            plan = f"ERROR {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
