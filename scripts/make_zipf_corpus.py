"""Deterministic Zipfian documents corpus — the heavy-tailed fixture
the prefix-filter dedup tier (`ngram_jaccard_prefix`) was built for.

The driver's synthetic documents table has a ~931-shingle DENSE
vocabulary (mean df ≈ 275, no rare tail), which refutes prefix
filtering BY CONSTRUCTION: every shingle is hot, so prefixes stay hot
and the candidate join degenerates (BASELINE.md round-5 probe). Real
text is the opposite — token frequency is Zipfian and vocabulary grows
with the corpus (Heaps' law), so most shingles are RARE and the prefix
theorem prunes almost everything. This script manufactures that shape
with zero RNG state (xxhash64-derived, fully reproducible):

- vocabulary size V = n_docs (Heaps-like growth: bigger corpus, bigger
  vocab);
- token at (doc, pos) has rank ``ceil(V ** u)`` for a hash-derived
  uniform u — i.e. P(rank r) ∝ 1/r, Zipf exponent 1: a hot head (rank
  1 covers ~1/ln V of all tokens) plus a long rare tail;
- doc length 30..70 tokens;
- every 20th base doc gets a NEAR-DUP twin (doc_id += n_docs) with one
  token appended — shingle Jaccard ≈ (L-1)/(L+1) ≈ 0.94..0.97, so a
  τ=0.8 run has real pairs to find and exact-vs-prefix equality is a
  non-trivial check.

Usage:
    python scripts/make_zipf_corpus.py DEST_DIR N_DOCS
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession, functions as F


def zipf_documents(spark: SparkSession, n_docs: int) -> DataFrame:
    """(doc_id, text, lang, source, n_chars) with Zipf-1 tokens over a
    vocabulary of size ``n_docs`` plus near-dup twins for every 20th
    doc. Deterministic (xxhash64); no Python in the generation plan."""
    v = max(2, n_docs)
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # u in (0,1): (pmod(hash, 1e6) + 0.5) / 1e6 — never exactly 0 or 1
    tok = (
        "concat('w', cast(ceil(pow({v}, "
        "(pmod(xxhash64(doc_id * 1000003 + j), 1000000) + 0.5) / 1000000.0"
        ")) as bigint))"
    ).format(v=v)
    text = F.expr(
        "concat_ws(' ', transform(sequence(1, 30 + "
        f"cast(pmod(xxhash64(doc_id), 41) as int)), j -> {tok}))"
    )
    docs = base.select("doc_id", text.alias("text"))
    twins = (
        docs.where(F.col("doc_id") % 20 == 0)
        .select(
            (F.col("doc_id") + n_docs).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" wtail")).alias("text"),
        )
    )
    out = docs.unionByName(twins)
    return out.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("zipf").alias("source"),
        F.length("text").alias("n_chars"),
    )


def main() -> None:
    dest = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = (
        SparkSession.builder.appName("make-zipf")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = zipf_documents(spark, n_docs)
    df.repartition(8).write.mode("overwrite").parquet(
        str(pathlib.Path(dest) / "documents.parquet")
    )
    stats = df.agg(
        F.count("*").alias("rows"), F.sum(F.size(F.split("text", " "))).alias("tokens")
    ).collect()[0]
    print({"rows": stats["rows"], "tokens": stats["tokens"], "vocab": n_docs})
    spark.stop()


if __name__ == "__main__":
    main()
