"""N-gram language-model perplexity scoring (round 7) — the CCNet-style
quality filter: train a smoothed bigram LM on a reference corpus, score
every document by perplexity, keep the low-perplexity (fluent) tail.

Reference scope: the reference engine has no LM surface; this belongs
to the engine's LLM-data-pipeline north star (SURVEY.md) next to the
quality classifier and Gopher rules.

Everything is JVM-side DataFrame algebra — in-row zip_with bigram
extraction, one map-side-combined count aggregation, a broadcast
probability join — so the whole filter is Catalyst-planned with NO
Python in the hot path (unlike the real CCNet's KenLM binary, which
this container could not run anyway).

Scale
-----
* Training: the bigram extraction is SHUFFLE-FREE (token array
  zipped with its own tail inside the row — no lead() window, no
  doc_id exchange); the first shuffle is the (w1, w2) count
  aggregation (map-side combined), then one tiny context rollup.
  ``min_count`` prunes the long bigram tail the way every production
  LM does — at 100 TB the count table, not the corpus, is what must
  stay joinable.
* Scoring: re-derives bigrams the same way and LEFT-joins the model.
  The model side is broadcast when it fits (Catalyst/AQE decides);
  the corpus side never exchanges except the per-doc aggregation.
* Smoothing: add-alpha over the training vocabulary V. A scored
  bigram falls back to (alpha)/(c1 + alpha*V) when the pair is
  unseen but the context is known, and to 1/V when even the context
  is new — so perplexity is total (no zero probabilities), the
  property the filter needs on out-of-domain text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair. Built by
    zipping the token array with its own tail ENTIRELY inside the row
    (zip_with over two slices), not with a lead() window: the window
    formulation shuffles and sorts the whole exploded token stream by
    doc_id; this one is shuffle-free codegen — the first exchange in
    the LM pipeline is the bigram-count aggregation itself."""
    parts = F.split(F.col(text_col), " ")
    n = F.size(parts)
    pairs = F.zip_with(
        F.slice(parts, 1, n - 1),
        F.slice(parts, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return docs.select(
        "doc_id", F.explode(pairs).alias("bg")
    ).select("doc_id", "bg.w1", "bg.w2")


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    min_count: int = 1,
) -> DataFrame:
    """→ (w1, w2, logp) plus per-context rows (w1, NULL, log_unseen):
    add-alpha conditional log-probabilities ln((c + α)/(c1 + α·V)).
    The NULL-w2 rows carry each context's unseen-bigram fallback so
    ``score_perplexity`` needs only ONE join. ``min_count`` drops rare
    bigrams from the model (their mass falls to the fallback row) —
    the table-size control that keeps the model broadcastable at
    corpus scale."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero breaks total smoothing)")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    bigrams = _bigrams(docs, text_col)
    bg = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    if min_count > 1:
        bg = bg.where(F.col("c") >= min_count)
    # context totals BEFORE pruning would leak dropped mass; after
    # pruning, c1 is the model's own normalizer (standard practice)
    ctx = bg.groupBy("w1").agg(F.sum("c").alias("c1"))
    # V = training vocabulary (distinct tokens, either position)
    vocab_size = (
        bigrams.select(F.col("w1").alias("t"))
        .union(bigrams.select(F.col("w2").alias("t")))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )  # single scalar: bounded driver-side by construction
    denom = F.col("c1") + F.lit(float(alpha)) * F.lit(float(vocab_size))
    seen = (
        bg.join(ctx, "w1")
        .select(
            "w1",
            "w2",
            F.log((F.col("c") + F.lit(float(alpha))) / denom).alias("logp"),
        )
    )
    fallback = ctx.select(
        "w1",
        F.lit(None).cast("string").alias("w2"),
        F.log(F.lit(float(alpha)) / denom).alias("logp"),
    )
    out = seen.unionByName(fallback)
    # stash V for score-time uniform fallback (1/V) on unknown contexts
    return out.withColumn(
        "vocab_size", F.lit(int(vocab_size))
    )


def score_perplexity(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_bigrams, avg_nll, ppl): per-doc mean negative
    log-likelihood under the bigram model and its exp (perplexity).
    Total: unseen bigram → context fallback row; unknown context →
    uniform 1/V."""
    bigrams = _bigrams(docs, text_col)
    vocab_size = F.broadcast(
        lm.select(F.max("vocab_size").alias("v"))
    )
    seen = lm.where(F.col("w2").isNotNull()).select("w1", "w2", "logp")
    fb = lm.where(F.col("w2").isNull()).select(
        "w1", F.col("logp").alias("logp_fb")
    )
    scored = (
        bigrams.join(seen, ["w1", "w2"], "left")
        .join(fb, "w1", "left")
        .crossJoin(vocab_size)
        .select(
            "doc_id",
            F.coalesce(
                F.col("logp"),
                F.col("logp_fb"),
                -F.log(F.col("v").cast("double")),
            ).alias("ll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.round(-F.avg("ll"), 6).alias("avg_nll"),
        F.round(F.exp(-F.avg("ll")), 4).alias("ppl"),
    )
