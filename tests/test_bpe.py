"""BPE tokenizer training/application (operators/bpe.py)."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.operators.bpe import (
    _apply_merges,
    _merge_loop,
    apply_bpe,
    train_bpe,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def test_merge_loop_hand_case():
    # the Sennrich et al. toy family: 'low' dominates, so its chars
    # merge first, in left-to-right frequency order
    merges = _merge_loop([("low", 3), ("lower", 1), ("lowest", 1)], 10)
    assert merges[0][1:] == ("l", "o")
    assert merges[1][1:] == ("lo", "w")
    ranks = {(a, b): r for r, a, b in merges}
    assert _apply_merges("low", ranks) == ["low</w>"]
    # unseen words fall back to characters — never an error
    assert _apply_merges("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_merge_loop_deterministic_tie_break():
    # 'ab' and 'cd' both appear twice: the lexicographically smaller
    # pair must win the tie, every time
    m1 = _merge_loop([("ab", 2), ("cd", 2)], 1)
    m2 = _merge_loop([("cd", 2), ("ab", 2)], 1)
    assert m1 == m2
    assert m1[0][1:] == ("a", "b")


def test_merge_loop_stops_when_nothing_repeats():
    merges = _merge_loop([("abc", 1), ("def", 1)], 50)
    assert merges == []  # every pair occurs once — no merge earns it


def test_train_and_apply_on_corpus(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    merges = train_bpe(docs, num_merges=30, top_words=500)
    rows = merges.collect()
    assert 1 <= len(rows) <= 30
    assert [r.rank for r in rows] == list(range(len(rows)))
    assert all(r.merged == r.left + r.right for r in rows)

    out = apply_bpe(docs, merges).collect()
    assert len(out) == docs.count()
    for r in out:
        assert r.n_bpe_tokens >= r.n_words  # >= one token per word
        if r.n_words:
            assert r.compression > 0


def test_more_merges_never_increase_token_count(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(50)
    m5 = train_bpe(docs, num_merges=5, top_words=500)
    m40 = train_bpe(docs, num_merges=40, top_words=500)
    t5 = {r.doc_id: r.n_bpe_tokens for r in apply_bpe(docs, m5).collect()}
    t40 = {r.doc_id: r.n_bpe_tokens for r in apply_bpe(docs, m40).collect()}
    assert all(t40[d] <= t5[d] for d in t5)  # a superset vocab only helps
    # and the larger merge table extends the smaller one (same prefix)
    p5 = [tuple(r) for r in m5.collect()]
    p40 = [tuple(r) for r in m40.collect()]
    assert p40[: len(p5)] == p5


def test_apply_matches_independent_reference(spark, sf_small):
    """Differential: re-tokenize with a structurally different
    reference (iterative full-pass replacement in merge-rank order,
    the textbook formulation) — greedy-lowest-rank application must
    produce the same segmentation."""
    docs = load_table(spark, sf_small, "documents").limit(30)
    merges = train_bpe(docs, num_merges=25, top_words=500)
    pairs = [(r.left, r.right) for r in merges.collect()]

    def reference_tokens(word):
        syms = list(word) + ["</w>"]
        for a, b in pairs:  # rank order: apply each merge everywhere
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        return syms

    got = {r.doc_id: r.n_bpe_tokens for r in apply_bpe(docs, merges).collect()}
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in row.text.split(" ") if w]
        want = sum(len(reference_tokens(w)) for w in words)
        assert got[row.doc_id] == want, row.doc_id


def test_train_bpe_validation(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(docs, num_merges=0)
    with pytest.raises(ValueError, match="top_words"):
        train_bpe(docs, top_words=0)


def test_memoized_apply_matches_uncached_semantics(spark, sf_small):
    """Round 16 (VERDICT r15 task #6): apply_bpe memoizes word →
    token count per worker. The memo must be invisible: token counts
    equal a pure per-occurrence recompute on a fixture engineered so
    every word repeats many times (maximum hit rate)."""
    rows = [
        (i, " ".join(["lower", "newest", "widest", "lower"][i % 4 :] * 20))
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, num_merges=20, top_words=100)
    ranks = {(r.left, r.right): r.rank for r in merges.collect()}
    got = {r.doc_id: r.n_bpe_tokens for r in apply_bpe(docs, merges).collect()}
    from optimal_parallel_fp_growth_spark.operators.bpe import _apply_merges

    for doc_id, text in rows:
        words = [w for w in text.split(" ") if w]
        want = sum(len(_apply_merges(w, ranks)) for w in words)
        assert got[doc_id] == want, doc_id
