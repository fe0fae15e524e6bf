"""Corpus n-gram statistics and inverted index — LM-training staples
(no reference counterpart; driver north star: corpus-wide n-gram count
tables feed contamination checks, repetition filters, and classic LM
smoothing; the inverted index is the backbone of retrieval-style
decontamination).

Scale notes
-----------
``ngram_counts``: one codegen'd projection builds every document's
n-gram list JVM-side (no Python), one explode, ONE shuffle on the gram
key with map-side partial aggregation; the ``min_count`` filter runs
post-agg (HAVING). Output volume is bounded by distinct-gram count,
which the filter prunes hard at 100 TB (hapax grams dominate and are
dropped). The gram arrays are built with higher-order functions, so the
token array is materialized behind a projection boundary first (the
HOF-vs-CSE pitfall: lambda-bearing expressions are excluded from common
subexpression elimination, and without the boundary the split would run
once per reference).

``inverted_index``: df (document frequency) needs ALL postings per
token, but the posting list we *return* is capped at ``max_postings``.
Collecting every doc_id into one ``collect_list`` and slicing after
would ship the full posting list of every stop-token through the
shuffle (millions of ids for 'the' at 100 TB) — instead the cap rides a
rank-filtered window (``row_number() <= K``), which Spark ≥3.5 rewrites
to a two-phase WindowGroupLimit: each map task keeps only its local
top-K before the shuffle, so no task ever holds more than K ids per
token. df is a plain count aggregated alongside; the two aggregates
join on the token key they are both already partitioned by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from optimal_parallel_fp_growth_spark.functions.layout import fan_out_scan


def _split_tokens(text_col: str, sep: str) -> Column:
    """Tokenize by splitting on the LITERAL ``sep`` (round 16, advice
    r15): ``sep`` both tokenizes and re-joins, so gram text and any
    rebuilt ``text_clean`` round-trip the input for ANY separator —
    previously the split was hardcoded to " " while the join honored
    ``sep``, silently mis-tokenizing ``sep="\t"`` calls. ``F.split``
    takes a Java regex, so the separator rides inside \\Q...\\E
    literal quoting (a sep containing the closing escape is rejected
    rather than mis-parsed)."""
    if "\\E" in sep:
        raise ValueError(r"sep must not contain the regex literal \E")
    if sep == "":
        # \Q\E matches the empty string: the split would cut between
        # every character and yield empty edge tokens — nonsense grams,
        # silently (advice r16). Reject like the \E case.
        raise ValueError("sep must not be empty")
    return F.split(F.col(text_col), "\\Q" + sep + "\\E")


def _ngram_array(toks: Column, n: int, sep: str) -> Column:
    """Array of n-grams (as sep-joined strings) from a token array.

    Guarded: documents shorter than ``n`` tokens yield an empty array —
    ``F.sequence(1, 0)`` would otherwise DESCEND ([1, 0]), silently
    fabricating grams from negative slices.
    """
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), sep))


def ngram_counts(
    docs: DataFrame,
    n: int = 3,
    min_count: int = 2,
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Corpus-wide n-gram count table: → (gram, cnt), cnt >= min_count.

    Tokenization splits on the literal ``sep`` (default " " — the
    reference's split-on-space, epfp/EPFP.scala:26); grams are token
    windows joined with the same ``sep``, so gram text round-trips
    the input for any separator. Repeated occurrences
    inside one document all count (this is a corpus frequency table,
    not a document-frequency table — see ``inverted_index`` for df).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # fan out a single-split scan before the tokenize/gram explode —
    # the whole chain otherwise runs as ONE serial task on an
    # unsplittable source (functions/layout.py; round-17 job profiles
    # showed 0.3-0.8 s single-task scan stages across this family)
    toks = fan_out_scan(docs.select(F.col(text_col)), text_col).select(
        _split_tokens(text_col, sep).alias("toks")
    )
    grams = toks.select(
        F.explode(_ngram_array(F.col("toks"), n, sep)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def inverted_index(
    docs: DataFrame,
    max_postings: int = 10,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token → (df, capped posting list): → (token, df, postings).

    ``df`` counts every document containing the token (exact, over all
    postings); ``postings`` is the ``max_postings`` SMALLEST doc ids,
    '|'-joined in ascending order (a string, so the DuckDB oracle
    compares bit-for-bit — list hashing differs across engines).
    Tokens are distinct-per-document (this is document frequency, not
    term frequency).
    """
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    # deliberately NOT fan_out_scan'd (round 17): the per-row work here
    # is one plain split (no gram build, no hashing), and the A/B
    # measured the added exchange costing more than the serial scan
    # saves (0.43 s -> 0.71 s warm at sf0.1) — the rest of this family
    # fans out because their tokenize/gram chains are compute-bound
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    )
    dfreq = (
        pairs.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    capped = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_postings)
        .groupBy("token")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("doc_id")).cast("array<string>"), "|"
            ).alias("postings")
        )
    )
    return dfreq.join(capped, "token").select("token", "df", "postings")


def source_ngram_overlap(
    docs: DataFrame,
    n: int = 3,
    source_col: str = "source",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Cross-source contamination matrix: for every unordered source
    pair, how many distinct n-grams they share. → (source_a, source_b,
    shared_grams) with source_a < source_b.

    Scale shape: NOT a gram self-join (which ships every posting twice
    and explodes on stop-grams). Instead distinct (source, gram) pairs
    collapse to one sorted source-set per gram — an array bounded by the
    number of SOURCES (handful), not documents — and the pair expansion
    is a per-row nested-loop over that tiny array, JVM-side. Two
    shuffles total (distinct, final pair count), both map-side combined;
    per-gram work is O(#sources²) with #sources ~ dozens at 100 TB.
    """
    # keyed on the text, not the source: sources are a handful of
    # distinct values, so hashing on source would collapse the fan-out
    toks = fan_out_scan(
        docs.select(F.col(source_col).alias("source"), F.col(text_col)),
        text_col,
    ).select("source", _split_tokens(text_col, sep).alias("toks"))
    sg = toks.select(
        "source", F.explode(_ngram_array(F.col("toks"), n, sep)).alias("gram")
    ).distinct()
    per_gram = sg.groupBy("gram").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    # all ordered pairs (ss[i], ss[j]) with i < j, built with indexed HOFs
    pairs = per_gram.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ss",
                    lambda x, i: F.transform(
                        F.slice(F.col("ss"), i + 2, F.size("ss")),
                        lambda y: F.struct(
                            x.alias("source_a"), y.alias("source_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.source_a").alias("source_a"),
                      F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 6,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Cross-document repeated-substring signal — the "deduplicate
    long repeated spans" scope of substring-level training-data dedup
    (Lee et al. 2022), re-based from suffix arrays (inherently
    single-machine) to n-gram postings (inherently distributed): an
    n-token gram occurring in >= ``min_docs`` DISTINCT documents marks
    every one of its occurrences as cross-corpus repeated text.
    → (doc_id, n_grams, repeated_occ, repeat_frac) for EVERY document
    (zero-repeat docs included; short docs report 0 grams, frac 0).

    Scale shape: explode once; the (doc, gram) occurrence aggregate is
    ONE map-side-combined shuffle; the gram-level doc-frequency
    aggregate reuses that exchange's partitioning (already keyed by
    gram after the pivot), and the repeated-gram filter joins back on
    the SAME gram key — no second posting explosion. The final per-doc
    rollup is a doc_id shuffle of at most one row per (doc, repeated
    gram). No step ever materializes a suffix structure or an
    uncombined posting list; stop-gram skew is bounded by the
    (doc,gram) pre-aggregation (a gram contributes one row per doc,
    not one per occurrence, to every stage past the first).

    The gram TEXT never crosses an exchange: only its xxhash64 rides
    the shuffles (the output is counts, so gram identity — not gram
    text — is all the pipeline needs). Measured at sf1 this cut the
    posting shuffle 204 MB → 98 MB at a fixed plan; a 2^-64 hash collision would
    merge two distinct grams — the standard trade every hashed
    dedup tier in this repo (minhash/simhash/fingerprints) already
    makes."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    toks = fan_out_scan(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        "doc_id",
    ).select("doc_id", _split_tokens(text_col, sep).alias("toks"))
    base = toks.select(
        "doc_id",
        F.greatest(F.size("toks") - (n - 1), F.lit(0)).alias("n_grams"),
        F.col("toks"),
    )
    occ = (
        base.select(
            "doc_id",
            F.explode(_ngram_array(F.col("toks"), n, sep)).alias("g"),
        )
        .select("doc_id", F.xxhash64("g").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    rep = (
        occ.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_docs)
        .select("gram")
    )
    per_doc = (
        occ.join(rep, "gram")
        .groupBy("doc_id")
        .agg(F.sum("occ").alias("repeated_occ"))
    )
    return (
        base.select("doc_id", "n_grams")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("repeated_occ"), F.lit(0)).alias("repeated_occ"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.coalesce(F.col("repeated_occ"), F.lit(0))
                    / F.col("n_grams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("repeat_frac"),
        )
    )


def remove_repeated_spans(
    docs: DataFrame,
    n: int = 6,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Substring-level dedup as a TRANSFORM (round 15) — the removal
    stage :func:`repeated_spans` only signals: every token position
    covered by an n-gram occurring in ≥ ``min_docs`` DISTINCT
    documents is dropped, and the survivors re-join in order — the
    "deduplicate long repeated spans" action of Lee et al. 2022
    (arXiv:2107.06499), re-based from suffix arrays to n-gram postings
    exactly like the signal tier. → (doc_id, n_tokens, n_removed,
    text_clean) for EVERY document (short/clean docs pass through
    unchanged; a fully-covered document cleans to '').

    Scale shape: the posting stages are `repeated_spans`' — one
    map-side-combined (doc, gram) shuffle carrying xxhash64 gram ids
    (never gram text), a gram-keyed doc-frequency cut reusing that
    exchange's partitioning, and a join back on the same gram key.
    The only NEW exchange is the per-document reconstruction: covered
    START positions explode into covered token positions (n rows per
    repeated occurrence — bounded by the repeated-occurrence count,
    not the corpus), an anti-join keeps surviving (doc, pos, tok)
    rows, and ONE doc_id-keyed aggregation re-joins each document
    in-row (sort_array over (pos, tok) structs — per-doc array sort,
    no window, the ngram_jaccard_prefix lesson). Nothing quadratic;
    stop-gram skew is bounded by the same (doc, gram) pre-aggregation
    as the signal tier."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # fan out BEFORE the persist: a single-split source otherwise
    # materializes the cache as ONE partition and every downstream
    # stage reading it (posting explode, position explode,
    # reconstruction) runs serial — round-17 job profile showed
    # 0.84 s + 0.57 s single-task jobs inside dedup_spans
    toks = fan_out_scan(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        "doc_id",
    ).select("doc_id", _split_tokens(text_col, sep).alias("toks"))
    toks.persist()  # feeds the gram postings AND the reconstruction
    # gram occurrences WITH start positions (0-based)
    occ = toks.select(
        "doc_id",
        F.posexplode(_ngram_array(F.col("toks"), n, sep)).alias("gi", "g"),
    ).select("doc_id", "gi", F.xxhash64("g").alias("gram"))
    rep = (
        occ.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= min_docs)
        .select("gram")
    )
    covered = (
        occ.join(rep, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gi"), F.col("gi") + (n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    positions = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    kept = positions.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            sep,
        ).alias("text_clean"),
    )
    from optimal_parallel_fp_growth_spark.functions.caching import (
        tag_cached_inputs,
    )

    out = (
        toks.select("doc_id", F.size("toks").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("int").alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
    return tag_cached_inputs(out, toks)
