"""max_df stop-shingle pruning: identical jaccard values, subset recall."""

from __future__ import annotations

from optimal_parallel_fp_growth_spark.operators.dedup import ngram_jaccard_pairs
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def _pairs(df):
    return {(r.doc_a, r.doc_b): r.jaccard for r in df.collect()}


def test_max_df_pruning_is_exact_on_values_subset_on_pairs(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.2))
    huge = _pairs(ngram_jaccard_pairs(docs, threshold=0.2, max_df=10**9))
    pruned = _pairs(ngram_jaccard_pairs(docs, threshold=0.2, max_df=5))

    assert huge == exact  # max_df beyond every df == exact tier
    assert set(pruned) <= set(exact)  # pruning only loses pairs
    for pair, j in pruned.items():
        assert j == exact[pair]  # surviving values identical
