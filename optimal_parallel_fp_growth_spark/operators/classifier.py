"""Hashed-feature linear text classifier — fastText-shaped quality
scoring, the model-based companion to the heuristic
``textops.quality_score`` (LLM-curation north star; no reference
counterpart).

Inference only: score(doc) = sigmoid(bias + mean over tokens of
w[h(token) mod B]). That is logistic regression over a hashed
bag-of-words — the fastText architecture with dim=1 — and is exactly
how production curation pipelines apply a quality/toxicity classifier
to a 100 TB corpus: the model is tiny and static, the corpus is the
big side.

Scale shape: the weight table is B rows (bucket, weight) and joins
BROADCAST onto the exploded token stream; the only real shuffle is the
per-document aggregation (map-side combined, doc rows co-located from
the scan). No Python anywhere — hashing, lookup, mean, and sigmoid are
all codegen'd expressions.

Determinism across engines: weights are INTEGERS in [-1e6, 1e6]
(micro-units), summed exactly (order-independent), and only converted
to double inside the final sigmoid; token buckets come from the same
md5-prefix hash both engines compute bit-for-bit. ``seed_weights``
generates a deterministic md5-derived stand-in table — the documented
swap-in point for real trained coefficients (load them as any
(bucket, weight_micro) DataFrame; the container ships no trained
model, same policy as the multimodal decode stub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

N_BUCKETS = 1024
WEIGHT_SCALE = 1_000_000  # micro-units: integer weights, exact sums


def _h32(col: Column) -> Column:
    """32-bit md5-prefix hash (the repo-wide cross-engine hash)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def seed_weights(
    spark: SparkSession, n_buckets: int = N_BUCKETS, seed: str = "w"
) -> DataFrame:
    """Deterministic stand-in weight table → (bucket, weight_micro),
    weight_micro uniform-ish in [-1e6, 1e6]. Replace with trained
    coefficients in production — any DataFrame with this schema works."""
    h = _h32(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string")))
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (h % (2 * WEIGHT_SCALE + 1) - WEIGHT_SCALE).alias("weight_micro"),
    )


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = N_BUCKETS,
    bias: float = 0.0,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the linear model to every document.
    → (doc_id, n_tokens, score, label); score = sigmoid(bias +
    mean token weight), rounded to 6; label = score ≥ threshold."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    feat = tok.select(
        "doc_id",
        (_h32(F.concat(F.lit("t:"), F.col("tok"))) % n_buckets).alias("bucket"),
    )
    agg = (
        feat.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("weight_micro").alias("sw_micro"),  # exact integer sum
        )
    )
    x = (
        F.lit(bias)
        + F.col("sw_micro").cast("double")
        / F.lit(float(WEIGHT_SCALE))
        / F.col("n_tokens")
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 6)
    return agg.select(
        "doc_id",
        "n_tokens",
        score.alias("score"),
        (score >= threshold).alias("label"),
    )
