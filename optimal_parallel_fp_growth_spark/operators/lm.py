"""N-gram language-model perplexity scoring (round 7) — the CCNet-style
quality filter: train a smoothed n-gram LM (orders 1..4; bigram is the
default and the oracle-gated path) on a reference corpus, score every
document by perplexity, keep the low-perplexity (fluent) tail.

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


def _ngram_pairs(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, ctx, w) — one row per n-gram: ``ctx`` is the space-
    joined n-1 preceding tokens (empty string for unigrams), ``w`` the
    predicted token. Built ENTIRELY inside the row (transform over a
    position sequence + slices), not with lead() windows: the window
    formulation shuffles and sorts the whole exploded token stream by
    doc_id; this is shuffle-free codegen — the first exchange in the
    LM pipeline is the count aggregation itself."""
    parts = F.split(F.col(text_col), " ")
    m = F.size(parts)
    if n == 1:
        pairs = F.transform(
            parts, lambda w: F.struct(F.lit("").alias("ctx"), w.alias("w"))
        )
    else:
        # positions 1..m-n+1; guard m < n (Spark's sequence DESCENDS
        # when start > stop, which would fabricate pairs)
        pairs = F.when(
            m >= n,
            F.transform(
                F.sequence(F.lit(1), m - (n - 1)),
                lambda i: F.struct(
                    F.concat_ws(" ", F.slice(parts, i, n - 1)).alias("ctx"),
                    F.element_at(parts, i + (n - 1)).alias("w"),
                ),
            ),
        ).otherwise(F.array())
    return docs.select(
        "doc_id", F.explode(pairs).alias("g")
    ).select("doc_id", "g.ctx", "g.w")


def train_ngram_lm(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    alpha: float = 0.5,
    min_count: int = 1,
) -> DataFrame:
    """→ (ctx, w, logp) plus per-context rows (ctx, NULL, log_unseen):
    add-alpha conditional log-probabilities ln((c + α)/(c1 + α·V))
    for an order-``n`` model (``ctx`` = n-1 space-joined tokens; ""
    for the unigram model). The NULL-w rows carry each context's
    unseen-continuation fallback so ``score_perplexity`` needs only
    ONE join. ``min_count`` drops rare n-grams from the model (their
    mass falls to the fallback row) — the table-size control that
    keeps the model broadcastable at corpus scale (essential for
    n ≥ 3, where the raw table grows near-linearly with the corpus)."""
    if not 1 <= n <= 4:
        raise ValueError("n must be in 1..4")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero breaks total smoothing)")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    grams = _ngram_pairs(docs, text_col, n)
    bg = grams.groupBy("ctx", "w").agg(F.count(F.lit(1)).alias("c"))
    if min_count > 1:
        bg = bg.where(F.col("c") >= min_count)
    # context totals BEFORE pruning would leak dropped mass; after
    # pruning, c1 is the model's own normalizer (standard practice)
    ctx = bg.groupBy("ctx").agg(F.sum("c").alias("c1"))
    # V = training vocabulary: every token seen in any position
    vocab_size = (
        grams.select(F.explode(F.split("ctx", " ")).alias("t"))
        .where(F.col("t") != "")
        .union(grams.select(F.col("w").alias("t")))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )  # single scalar: bounded driver-side by construction
    denom = F.col("c1") + F.lit(float(alpha)) * F.lit(float(vocab_size))
    seen = (
        bg.join(ctx, "ctx")
        .select(
            "ctx",
            "w",
            F.log((F.col("c") + F.lit(float(alpha))) / denom).alias("logp"),
        )
    )
    fallback = ctx.select(
        "ctx",
        F.lit(None).cast("string").alias("w"),
        F.log(F.lit(float(alpha)) / denom).alias("logp"),
    )
    out = seen.unionByName(fallback)
    # stash V and n for score time (uniform 1/V on unknown contexts;
    # the order must match at scoring or the join keys are garbage)
    return out.withColumn("vocab_size", F.lit(int(vocab_size))).withColumn(
        "order_n", F.lit(int(n))
    )


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    min_count: int = 1,
) -> DataFrame:
    """The order-2 model (the CCNet default) — see train_ngram_lm."""
    return train_ngram_lm(
        docs, n=2, text_col=text_col, alpha=alpha, min_count=min_count
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
    n = lm.select(F.max("order_n")).collect()[0][0]
    grams = _ngram_pairs(docs, text_col, int(n))
    vocab_size = F.broadcast(
        lm.select(F.max("vocab_size").alias("v"))
    )
    seen = lm.where(F.col("w").isNotNull()).select("ctx", "w", "logp")
    fb = lm.where(F.col("w").isNull()).select(
        "ctx", F.col("logp").alias("logp_fb")
    )
    scored = (
        grams.join(seen, ["ctx", "w"], "left")
        .join(fb, "ctx", "left")
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
