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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.caching import (
    RddBlockHandle,
    persistent_rdd_ids,
    tag_cached_inputs,
)


def _ngram_pairs(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, ctx, w) — one row per n-gram: ``ctx`` is the space-
    joined n-1 preceding tokens (empty string for unigrams), ``w`` the
    predicted token. Built ENTIRELY inside the row (zip_with over
    shifted slices of the token array), not with lead() windows: the
    window formulation shuffles and sorts the whole exploded token
    stream by doc_id; this is shuffle-free codegen — the first
    exchange in the LM pipeline is the count aggregation itself.

    The contexts are built INCREMENTALLY: n-2 zip_with passes extend
    each position's context by one shifted token, then a final
    zip_with attaches the predicted token. Each pass is one linear
    array traversal, so the per-token cost is O(n) total — unlike the
    round-7 ``transform(sequence(...))`` + per-position
    ``slice``+``concat_ws`` form, which re-sliced the array at every
    position (measured 8x slower at n=2, and it sat on the hot path
    TWICE: train and score)."""
    parts = F.split(F.col(text_col), " ")
    m = F.size(parts)
    if n == 1:
        pairs = F.transform(
            parts, lambda w: F.struct(F.lit("").alias("ctx"), w.alias("w"))
        )
    else:
        # L = number of n-grams; the F.when guards m < n (slice with a
        # non-positive length is illegal, and there are no grams)
        length = m - (n - 1)
        ctx = F.slice(parts, 1, length)
        for j in range(2, n):
            ctx = F.zip_with(
                ctx,
                F.slice(parts, j, length),
                lambda acc, t: F.concat(acc, F.lit(" "), t),
            )
        pairs = F.when(
            m >= n,
            F.zip_with(
                ctx,
                F.slice(parts, n, length),
                lambda c, t: F.struct(c.alias("ctx"), t.alias("w")),
            ),
        ).otherwise(F.array())
    from optimal_parallel_fp_growth_spark.functions.layout import (
        fan_out_scan,
    )

    # fan out a single-split scan before the per-token gram build —
    # train AND score both run through here (functions/layout.py)
    return fan_out_scan(
        docs.select("doc_id", F.col(text_col)), "doc_id"
    ).select("doc_id", F.explode(pairs).alias("g")).select(
        "doc_id", "g.ctx", "g.w"
    )


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
    # checkpoint the PRE-PRUNE count table so the training corpus is
    # scanned exactly ONCE: the vocabulary count below and the model
    # arithmetic both read these blocks instead of re-running the
    # extraction (round 7 re-scanned the corpus for the vocab scalar).
    # The blocks are registered for the tag/release lifecycle; they
    # are count-table-sized (the thing min_count keeps bounded), not
    # corpus-sized.
    spark = docs.sparkSession
    pre_ids = persistent_rdd_ids(spark)
    bg_all = bg.localCheckpoint()
    blocks = persistent_rdd_ids(spark) - pre_ids
    bg = bg_all
    if min_count > 1:
        bg = bg.where(F.col("c") >= min_count)
    # context totals BEFORE pruning would leak dropped mass; after
    # pruning, c1 is the model's own normalizer (standard practice)
    ctx = bg.groupBy("ctx").agg(F.sum("c").alias("c1"))
    # V = training vocabulary: every token seen in any position —
    # computed from the PRE-prune table (pruning shrinks the model,
    # never the vocabulary). The distinct (ctx, w) table carries
    # exactly the same token set as the raw gram stream (every token
    # occurs in some gram's context or predicted slot), so this never
    # touches the corpus again — for n=1 the empty ctx is filtered
    # and w alone covers V.
    vocab_size = (
        bg_all.select(F.explode(F.split("ctx", " ")).alias("t"))
        .where(F.col("t") != "")
        .union(bg_all.select(F.col("w").alias("t")))
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
    out = out.withColumn("vocab_size", F.lit(int(vocab_size))).withColumn(
        "order_n", F.lit(int(n))
    )
    return tag_cached_inputs(out, RddBlockHandle(spark, blocks))


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
    uniform 1/V.

    The model is ``localCheckpoint``-ed before use: scoring needs the
    model THREE times (the (n, V) scalar lookup, the seen-gram join,
    the fallback join) and the training plan behind it ends in a full
    count aggregation — without the checkpoint each use re-runs that
    aggregation from the corpus scan (round-7 measured ~13% of the
    stage on the scalar collects alone)."""
    spark = docs.sparkSession
    pre_ids = persistent_rdd_ids(spark)
    lm = lm.localCheckpoint()
    blocks = persistent_rdd_ids(spark) - pre_ids
    head = lm.agg(
        F.max("order_n").alias("n"), F.max("vocab_size").alias("v")
    ).collect()[0]
    if head["n"] is None:
        raise ValueError(
            "empty language model: train_ngram_lm saw no n-grams "
            "(corpus empty, or every document shorter than n tokens)"
        )
    n, vocab_size = int(head["n"]), int(head["v"])
    grams = _ngram_pairs(docs, text_col, n)
    seen = lm.where(F.col("w").isNotNull()).select("ctx", "w", "logp")
    fb = lm.where(F.col("w").isNull()).select(
        "ctx", F.col("logp").alias("logp_fb")
    )
    scored = (
        grams.join(seen, ["ctx", "w"], "left")
        .join(fb, "ctx", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("logp"),
                F.col("logp_fb"),
                F.lit(-math.log(float(vocab_size))),
            ).alias("ll"),
        )
    )
    out = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.round(-F.avg("ll"), 6).alias("avg_nll"),
        F.round(F.exp(-F.avg("ll")), 4).alias("ppl"),
    )
    # the checkpointed model blocks join the tag/release lifecycle just
    # like train_ngram_lm's — otherwise every score call leaks its
    # model-sized RDD blocks for the session lifetime (ADVICE r8)
    return tag_cached_inputs(out, RddBlockHandle(spark, blocks))
