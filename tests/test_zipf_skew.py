"""Zipf skew-stress entry (round 11, VERDICT r10 #7): the prefix-filter
dedup tier driven over a corpus with a genuine heavy hitter (hottest
shingle df ≈ n_docs), differentially pinned against the all-postings
exact tier, with the twin-pair guarantee and the skew evidence itself
asserted so the fixture can't silently go tame."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.dedup import (
    ngram_jaccard_pairs,
)
from optimal_parallel_fp_growth_spark.queries_docs import (
    _ZIPF_TAU,
    _ZIPF_TWIN_EVERY,
    q_dedup_zipf_prefix,
    zipf_corpus,
)


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_matches_exact_tier_on_zipf_corpus(spark, sf_small):
    """Full-semantics differential (the TWINS pin): the prefix tier's
    pair set over the skewed corpus equals the all-postings exact
    tier's, bit-for-bit."""
    corpus = zipf_corpus(spark, sf_small)
    pref = _pairs(q_dedup_zipf_prefix(spark, sf_small))
    exact = _pairs(
        ngram_jaccard_pairs(corpus, threshold=_ZIPF_TAU, max_df=0)
    )
    assert pref == exact
    assert len(pref) > 0


def test_twin_pairs_all_found(spark, sf_small):
    """Every generated near-dup twin whose base doc has ≥ 4 distinct
    shingles must surface: the appended out-of-vocab token adds exactly
    one new shingle, so J = |A|/(|A|+1) ≥ 0.8 ⟺ |A| ≥ 4. Degenerate
    all-head docs (every token the hottest rank → a single distinct
    shingle, J = 0.5) legitimately stay below τ — both engines agree,
    so they are excluded by the same closed-form criterion, not
    hand-waved away."""
    corpus = zipf_corpus(spark, sf_small)
    n_sh = {
        r.doc_id: r.n
        for r in corpus.where(F.col("doc_id") >= 0)
        .select(
            "doc_id",
            F.size(
                F.array_distinct(
                    F.expr(
                        "transform(slice(split(text, ' '), 1,"
                        " size(split(text, ' ')) - 1),"
                        " (t, i) -> concat(t, ' ',"
                        " element_at(split(text, ' '), i + 2)))"
                    )
                )
            ).alias("n"),
        )
        .collect()
    }
    twin_ids = {
        r.doc_id for r in corpus.where(F.col("doc_id") < 0).collect()
    }
    assert len(twin_ids) > 0
    expected = {t for t in twin_ids if n_sh[-t - 1] >= 4}
    assert len(expected) > 0.8 * len(twin_ids)  # degenerates are rare
    found = {
        (a, b)
        for (a, b, _) in _pairs(q_dedup_zipf_prefix(spark, sf_small))
    }
    for tid in expected:
        base = -tid - 1
        pair = (min(tid, base), max(tid, base))
        assert pair in found, f"twin pair {pair} missing"
        assert base % _ZIPF_TWIN_EVERY == 0


def test_corpus_really_has_a_heavy_hitter(spark, sf_small):
    """The point of the fixture: the hottest shingle's document
    frequency is within a small factor of the corpus size (the df²
    regime the exact tier cannot survive at scale), and a rare tail
    exists (df = 1 shingles)."""
    corpus = zipf_corpus(spark, sf_small)
    n_docs = corpus.count()
    sh = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(slice(split(text, ' '), 1,"
                    " size(split(text, ' ')) - 1),"
                    " (t, i) -> concat(t, ' ',"
                    " element_at(split(text, ' '), i + 2)))"
                )
            )
        ).alias("shingle"),
    )
    df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    top, n_rare = df.agg(
        F.max("df").alias("top"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("rare"),
    ).collect()[0]
    assert top > 0.5 * n_docs, (top, n_docs)  # the heavy hitter
    assert n_rare > 0  # and a rare tail for prefixes to live in


def test_salted_counts_match_plain_groupby(spark, sf_small):
    """GROUND_TRUTH_PIN for skewed_token_counts: the two-phase salted
    aggregation equals the plain (unsalted) groupBy over the same
    exploded tokens — decomposable aggregates make them exactly
    interchangeable; only the shuffle shape differs."""
    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_skewed_token_counts,
    )

    corpus = zipf_corpus(spark, sf_small)
    toks = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    plain = {
        r.token: (r.n, r.min_doc, r.max_doc)
        for r in toks.groupBy("token")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .collect()
    }
    salted = {
        r.token: (r.n, r.min_doc, r.max_doc)
        for r in q_skewed_token_counts(spark, sf_small).collect()
    }
    assert salted == plain
    # the fixture's point: one token holds ~half of all rows
    total = sum(n for (n, _, _) in plain.values())
    assert max(n for (n, _, _) in plain.values()) > 0.3 * total


def test_salted_join_matches_plain_join(spark, sf_small):
    """GROUND_TRUTH_PIN for skewed_doc_hotness: the salted replicate-
    small-side join equals the plain equi join on the same inputs —
    the salt is join-key-complete by construction, so only the shuffle
    shape differs."""
    from optimal_parallel_fp_growth_spark.queries_docs import (
        q_skewed_doc_hotness,
    )

    corpus = zipf_corpus(spark, sf_small)
    toks = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    dim = toks.groupBy("token").agg(F.count("*").alias("df"))
    plain = {
        r.doc_id: (r.df_sum, r.n_tokens)
        for r in toks.join(dim, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("df").alias("df_sum"), F.count("*").alias("n_tokens")
        )
        .collect()
    }
    salted = {
        r.doc_id: (r.df_sum, r.n_tokens)
        for r in q_skewed_doc_hotness(spark, sf_small).collect()
    }
    assert salted == plain
    assert len(salted) == corpus.count()  # every doc scores


def test_salted_semi_and_anti_match_plain_on_zipf_corpus(spark, sf_small):
    """VERDICT r11 task #7: the dedup/decontamination family's joins
    are semi/anti shaped, so a skewed contamination key needs the same
    replicate-small-side path. Token stream = the Zipf corpus (heavy
    hitter with df ≈ n_docs); the 'contamination' list mixes the hot
    token, cold tokens, absent tokens, and a duplicate entry."""
    from optimal_parallel_fp_growth_spark.functions.skew import salted_join

    corpus = zipf_corpus(spark, sf_small)
    toks = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    hot = toks.groupBy("token").count().orderBy(F.desc("count")).first().token
    probe = spark.createDataFrame(
        [(hot,), (hot,), ("absent_tok",), ("tok0001",)],
        "token string",
    )
    for how in ("left_semi", "left_anti"):
        plain = {
            tuple(r) for r in toks.join(probe, "token", how).collect()
        }
        salted = {
            tuple(r)
            for r in salted_join(toks, probe, "token", how=how).collect()
        }
        assert salted == plain, how
        # columns: same as the plain join (big-side only, key first),
        # no salt leakage
        assert (
            salted_join(toks, probe, "token", how=how).columns
            == toks.join(probe, "token", how).columns
        )
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(toks, probe, "token", how="right")
