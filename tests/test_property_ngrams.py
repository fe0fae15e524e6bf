"""Property tests: ngram_counts and inverted_index vs a brute-force
Python oracle on random token corpora (differential testing, same model
as test_property_mining)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from optimal_parallel_fp_growth_spark.operators.ngrams import (
    inverted_index,
    ngram_counts,
)

token = st.sampled_from(["a", "b", "c", "dd", "e"])
doc = st.lists(token, min_size=0, max_size=8).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)


def brute_ngrams(texts: list[str], n: int) -> Counter:
    c: Counter = Counter()
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            c[" ".join(toks[i : i + n])] += 1
    return c


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus, n=st.sampled_from([1, 2, 3]))
def test_ngram_counts_match_brute_force(spark, texts, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.gram: r.cnt for r in ngram_counts(df, n=n, min_count=1).collect()}
    assert got == dict(brute_ngrams(texts, n))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus, cap=st.sampled_from([1, 2, 100]))
def test_inverted_index_matches_brute_force(spark, texts, cap):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        for tok in set(t.split(" ")):
            want.setdefault(tok, []).append(i)
    got = {
        r.token: (r.df, r.postings)
        for r in inverted_index(df, max_postings=cap, min_df=1).collect()
    }
    assert got == {
        tok: (len(ids), "|".join(str(i) for i in sorted(ids)[:cap]))
        for tok, ids in want.items()
    }
