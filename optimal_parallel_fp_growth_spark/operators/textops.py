"""Text-analysis operators over the ``documents`` table — the quality/
filtering stage of an LLM training-data pipeline (no reference
counterpart; SURVEY §7.2 M7).

Everything is a narrow projection over one scan: Catalyst prunes the
parquet read to (doc_id, text) and fuses all expressions into one
codegen stage — the shape that survives 100 TB (zero shuffles, zero
Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from optimal_parallel_fp_growth_spark.functions.layout import fan_out_scan

from optimal_parallel_fp_growth_spark.functions.text import (
    EN_STOPWORDS,
    LANG_MARKERS,
    digit_ratio,
    marker_hits,
    regex_token_count,
    stopword_ratio,
    tokens,
)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/shape statistics. Tokens are materialized once
    behind a projection boundary (the split() expression would otherwise
    be re-evaluated for every stat that references it)."""
    t = F.col("__toks")
    return docs.withColumn("__toks", tokens(text_col)).select(
        "doc_id",
        F.length(text_col).alias("n_chars_obs"),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        regex_token_count(text_col).alias("n_regex_tokens"),
        F.round(
            (F.length(text_col) - F.size(t) + 1) / F.greatest(F.size(t), F.lit(1)), 6
        ).alias("avg_token_len"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(digit_ratio(text_col), 6).alias("digit_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic heuristic quality score in [0,1]:
    rewards medium length, lexical diversity, and some stopword mass —
    the standard cheap pre-filter before expensive dedup/classification."""
    t = F.col("__toks")
    n = F.size(t)
    diversity = F.size(F.array_distinct(t)) / F.greatest(n, F.lit(1))
    length_term = F.least(n / F.lit(50.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(t) * 5.0, F.lit(1.0))
    score = F.round(0.4 * length_term + 0.4 * diversity + 0.2 * stop_term, 6)
    return docs.withColumn("__toks", tokens(text_col)).select(
        "doc_id", score.alias("quality")
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax over per-language function-word
    hits; 'und' (undetermined) when no marker fires. Ties break on
    language code order (deterministic)."""
    t = F.col("__toks")
    scored: Column = F.array(
        *[
            F.struct(
                (-marker_hits(t, lang)).alias("neg_hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_sort(scored)[0]
    return docs.withColumn("__toks", tokens(text_col)).select(
        "doc_id",
        F.when(best["neg_hits"] < 0, best["lang"]).otherwise("und").alias("lang_pred"),
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 25,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    min_distinct_ratio: float = 0.3,
) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021 §A1.1
    heuristics, adapted to whitespace tokens): per-rule verdicts plus
    the conjunctive ``keep`` flag, one codegen'd projection — no
    shuffle, no Python, applied before any expensive dedup stage.

    Rules: word count in [min,max]; mean word length in [min,max];
    ≥ ``min_alpha_ratio`` of words contain an alphabetic character;
    ≥ ``min_stopword_hits`` English function words (the Gopher
    "contains 2 of the/be/to/of/and/…" rule — language-gate English
    corpora, or lower to 0 for multilingual); distinct-word ratio ≥
    ``min_distinct_ratio`` (the cheap one-pass repetition rule; the
    full top-k-gram family lives in :func:`repetition_signals`).
    → (doc_id, n_words, pass_word_count, pass_word_len, pass_alpha,
    pass_stopwords, pass_dup, keep)."""
    t = F.col("__toks")
    n = F.size(t)
    mean_wl = (F.length(text_col) - n + 1) / F.greatest(n, F.lit(1))
    alpha = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))) / F.greatest(
        n, F.lit(1)
    )
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    distinct_ratio = F.size(F.array_distinct(t)) / F.greatest(n, F.lit(1))
    flags = {
        "pass_word_count": (n >= min_words) & (n <= max_words),
        "pass_word_len": (mean_wl >= min_word_len) & (mean_wl <= max_word_len),
        "pass_alpha": alpha >= min_alpha_ratio,
        "pass_stopwords": stop_hits >= min_stopword_hits,
        "pass_dup": distinct_ratio >= min_distinct_ratio,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return docs.withColumn("__toks", tokens(text_col)).select(
        "doc_id",
        n.alias("n_words"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


ROLL_B = 1000003
ROLL_P = 2147483647  # 2^31-1: acc·B + h < 2^52, overflow-safe under ANSI


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of case/whitespace-normalized text, a
    64-bit-ish integer key (first 15 hex digits), and a Rabin-Karp-style
    ROLLING hash over the token sequence — order-sensitive (md5 of the
    set-identical-but-reordered doc differs), the cheap cross-corpus
    join key family."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), " +", " ")
    h = F.md5(norm)
    token_hashes = F.transform(
        F.col("__toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    fp_roll = F.aggregate(
        token_hashes,
        F.lit(0).cast("long"),
        lambda acc, hh: (acc * ROLL_B + hh) % ROLL_P,
    )
    return docs.withColumn("__toks", tokens(text_col)).select(
        "doc_id",
        h.alias("fp_md5"),
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("fp_int"),
        fp_roll.alias("fp_roll"),
    )


def token_quantiles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact token-count percentiles per language — the corpus-sizing
    profile (sequence-length budgeting) a training pipeline reads before
    packing. Uses Spark's exact ``percentile`` aggregate (linear
    interpolation, matching DuckDB ``quantile_cont`` bit-for-bit); at
    the 100 TB tier swap in ``percentile_approx`` (t-digest, one pass,
    bounded memory) — the approx-agg accuracy envelope is covered by
    tests/test_approx_aggs.py. → (lang, n_docs, p50, p90, p99)."""
    toks = docs.select("lang", F.size(F.split(F.col(text_col), " ")).alias("n_tokens"))
    return toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_tokens, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(n_tokens, 0.99)"), 6).alias("p99"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/quality signals per document — the
    filter stage that catches boilerplate and degenerate generations
    before training. → (doc_id, n_tokens, distinct_ratio,
    top_token_frac, top_2gram_frac).

    - ``distinct_ratio``   — |distinct tokens| / |tokens| (low = loopy).
    - ``top_token_frac``   — occurrences of the most frequent token /
      |tokens| ("fraction of characters in the most common word" family).
    - ``top_2gram_frac``   — occurrences of the most frequent word
      2-gram / |2-grams| (0.0 for docs of < 2 tokens).

    Shape: explode → two-level aggregation. The first groupBy keys on
    (doc_id, token) so the partial (map-side) aggregate collapses each
    document's repeats BEFORE the shuffle — repetitive documents, the
    very thing this measures, shuffle the least. The second groupBy
    reduces to one row per doc_id. Same two shuffles at any corpus
    size; no Python, no HOF in the hot path.
    """
    # fan out a single-split scan before tokenize/explode (layout.py)
    toks = fan_out_scan(
        docs.select("doc_id", F.col(text_col)), "doc_id"
    ).select("doc_id", tokens(text_col).alias("toks"))
    tok = toks.select("doc_id", F.explode("toks").alias("tok"))
    tok_stats = (
        tok.groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("count").alias("top_tok"),
        )
    )
    # raw (non-distinct) 2-grams: positions 1..n-1
    grams = toks.where(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                ),
            )
        ).alias("gram"),
    )
    gram_stats = (
        grams.groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("n_grams"), F.max("count").alias("top_gram"))
    )
    return (
        tok_stats.join(gram_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "distinct_ratio"
            ),
            F.round(F.col("top_tok") / F.col("n_tokens"), 6).alias(
                "top_token_frac"
            ),
            F.round(
                F.coalesce(F.col("top_gram") / F.col("n_grams"), F.lit(0.0)), 6
            ).alias("top_2gram_frac"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    broadcast_df: bool | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf.
    → (doc_id, term, tf, score, rank); idf = ln(N / df) over raw
    (non-distinct) term frequency, rank by (score desc, term asc) so
    the order is total and oracle-reproducible.

    Shape: explode → (doc, term) count [map-side partial agg] → term
    document frequencies [one small aggregate joined back] → per-doc
    top-k window, which Catalyst turns two-phase via
    InferWindowGroupLimit (rank filter → Partial WindowGroupLimit in
    the map stage). Nothing quadratic anywhere.

    The df table is |vocabulary|-sized, which is NOT always
    broadcast-safe (a 100 TB web corpus has a billion-term vocabulary).
    ``broadcast_df=None`` (default) leaves the join strategy to
    Catalyst/AQE: below ``autoBroadcastJoinThreshold`` the runtime
    re-plan converts it to a broadcast join (same plan as the hint on
    small corpora), above it the term-keyed shuffle join is the correct
    scale path — the hint is advisory, never load-bearing.
    ``broadcast_df=True/False`` pins either strategy explicitly."""
    tok = fan_out_scan(
        docs.select("doc_id", F.col(text_col)), "doc_id"
    ).select("doc_id", F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    if broadcast_df:
        df = F.broadcast(df)
    elif broadcast_df is False:
        df = df.hint("shuffle_merge")
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization (round 13) — the first transform
    of most training pipelines: Unicode NFC composition, control
    characters to spaces, whitespace runs collapsed, ends trimmed.
    → (doc_id, text_norm).

    NFC is the one step Spark has no builtin for, so it runs as ONE
    Arrow-batched pandas UDF (CPython's unicodedata implements the
    same UAX #15 as DuckDB's utf8proc — probed equal, so the oracle
    compares string-exact); the control-strip and collapse stay
    JVM-side regexp_replace in the engine-common regex subset."""
    import pandas as pd  # noqa: F401 (signature typing)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        # vectorized UAX #15 (pandas dispatches unicodedata.normalize
        # across the block without a Python-level lambda per element;
        # None passes through untouched) — ADVICE r13 task #4
        return s.str.normalize("NFC")

    col = _nfc(F.col(text_col))
    col = F.regexp_replace(col, "[\\x00-\\x1f\\x7f]", " ")
    col = F.trim(F.regexp_replace(col, "\\s+", " "))
    return docs.select("doc_id", col.alias("text_norm"))
