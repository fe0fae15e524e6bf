"""Ground-truth pins for round-9 rotation (VERDICT r8 task #2).

Each test here recomputes one registry entry's semantics independently
(pure python / numpy / hashlib over the collected fixture) so the entry
may hold a 4-round driver-window cap instead of the 2-round untwinned
floor — see GROUND_TRUTH_PINS in tests/test_registry_order.py. These
are full-semantics differentials, not smoke tests: any drift in the
operator breaks exact equality.
"""

from __future__ import annotations

import hashlib

import numpy as np

from optimal_parallel_fp_growth_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# textops: quality_score / text_stats / token_quantiles


def test_quality_score_hand_values(spark):
    from optimal_parallel_fp_growth_spark.operators.textops import quality_score

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),      # 3 toks, all distinct, 1 stopword
            (2, "x x x x"),          # 4 toks, 1 distinct, 0 stopwords
            (3, "to in is that"),    # all four are stopwords
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.quality for r in quality_score(docs).collect()}

    def expect(n, distinct, stop_hits):
        return round(
            0.4 * min(n / 50.0, 1.0)
            + 0.4 * (distinct / n)
            + 0.2 * min(stop_hits / n * 5.0, 1.0),
            6,
        )

    assert got[1] == expect(3, 3, 1)
    assert got[2] == expect(4, 1, 0)
    assert got[3] == expect(4, 4, 4)


def test_text_stats_hand_values(spark):
    from optimal_parallel_fp_growth_spark.operators.textops import text_stats

    text = "the cat 9 cat"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = text_stats(docs).collect()
    assert r.n_chars_obs == 13
    assert r.n_tokens == 4
    assert r.n_distinct_tokens == 3
    assert r.n_regex_tokens == 4  # the, cat, 9, cat
    assert r.avg_token_len == round((13 - 4 + 1) / 4, 6)
    assert r.stopword_ratio == round(1 / 4, 6)  # "the"
    assert r.digit_ratio == round(1 / 13, 6)


def test_token_quantiles_match_numpy_brute_force(spark, sf_small):
    """Exact percentile aggregate vs numpy's linear interpolation over
    the collected fixture — per language, bit-for-bit after round(6)."""
    from optimal_parallel_fp_growth_spark.operators.textops import token_quantiles

    docs = load_table(spark, sf_small, "documents")
    by_lang: dict[str, list[int]] = {}
    for row in docs.select("lang", "text").collect():
        by_lang.setdefault(row.lang, []).append(len(row.text.split(" ")))
    got = {r.lang: r for r in token_quantiles(docs).collect()}
    assert set(got) == set(by_lang)
    for lang, counts in by_lang.items():
        r = got[lang]
        assert r.n_docs == len(counts)
        arr = np.array(counts, dtype=np.float64)
        for col, q in (("p50", 50), ("p90", 90), ("p99", 99)):
            assert getattr(r, col) == round(
                float(np.percentile(arr, q)), 6
            ), (lang, col)


# ---------------------------------------------------------------------------
# dedup_exact


def test_dedup_exact_matches_brute_force(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.dedup import dedup_exact

    docs = load_table(spark, sf_small, "documents")
    want: dict[str, list[int]] = {}
    for row in docs.select("doc_id", "text").collect():
        want.setdefault(row.text, []).append(row.doc_id)
    expect = {
        hashlib.sha256(text.encode()).hexdigest(): (min(ids), len(ids))
        for text, ids in want.items()
    }
    got = {
        r.text_sha256: (r.doc_id_kept, r.n_dups)
        for r in dedup_exact(docs).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# embedding_neardup


def test_embedding_neardup_cosines_exact_and_recall(spark, sf_small):
    """Every emitted pair's cosine must equal the numpy brute-force
    value exactly (LSH approximates the CANDIDATE set, never the
    metric) and clear the threshold; recall vs the brute-force pair
    set must hold the floor (hamming-1 multi-probe)."""
    from optimal_parallel_fp_growth_spark.operators.similarity import (
        embedding_neardup_pairs,
    )
    from optimal_parallel_fp_growth_spark.queries_vectors import (
        NEARDUP_THRESHOLD,
    )

    emb = load_table(spark, sf_small, "embeddings")
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    ids = sorted(vecs)
    M = np.stack([vecs[i] for i in ids])
    norms = np.linalg.norm(M, axis=1)
    cos = (M @ M.T) / np.outer(norms, norms)
    brute = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            c = round(float(cos[a, b]), 6)
            if c >= NEARDUP_THRESHOLD:
                brute[(ids[a], ids[b])] = c

    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in embedding_neardup_pairs(
            emb, threshold=NEARDUP_THRESHOLD
        ).collect()
    }
    assert brute, "fixture must contain near-dup pairs"
    for pair, c in got.items():
        assert pair in brute and brute[pair] == c, pair
    recall = len(got) / len(brute)
    # measured 0.394 at sf0.001 (hamming-1 probe, tiny buckets); the
    # exact candidate contract is what the sf0.01 driver oracle pins —
    # this floor only catches a collapse of the probe scheme
    assert recall >= 0.25, f"neardup recall collapsed: {recall:.3f}"
