"""ngram_counts / inverted_index — edge cases + the two scale-path plan
pins (map-side partial agg for the gram count, two-phase
WindowGroupLimit for the posting cap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.ngrams import (
    inverted_index,
    ngram_counts,
)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c"),
            (3, "a b"),  # shorter than a trigram
            (4, "x"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_trigrams_count_short_docs_contribute_nothing(tiny_docs):
    got = {r.gram: r.cnt for r in ngram_counts(tiny_docs, n=3, min_count=1).collect()}
    assert got == {"a b c": 2, "b c d": 1}


def test_unigrams_equal_word_count(tiny_docs):
    got = {r.gram: r.cnt for r in ngram_counts(tiny_docs, n=1, min_count=1).collect()}
    # split('', ' ') yields [''] — the empty doc contributes one empty token,
    # matching the reference's split-on-space semantics (and DuckDB's).
    assert got == {"a": 3, "b": 3, "c": 2, "d": 1, "x": 1, "": 1}


def test_min_count_prunes(tiny_docs):
    got = {r.gram for r in ngram_counts(tiny_docs, n=2, min_count=3).collect()}
    assert got == {"a b"}


def test_n_must_be_positive(tiny_docs):
    with pytest.raises(ValueError, match="n must be"):
        ngram_counts(tiny_docs, n=0)


def test_inverted_index_df_counts_all_postings_cap_is_smallest(spark):
    docs = spark.createDataFrame(
        [(i, "common " + ("rare" if i == 7 else "filler")) for i in range(1, 9)],
        "doc_id long, text string",
    )
    rows = {r.token: r for r in inverted_index(docs, max_postings=3, min_df=1).collect()}
    assert rows["common"].df == 8  # df over ALL docs, not the cap
    assert rows["common"].postings == "1|2|3"  # smallest ids, ascending
    assert rows["rare"].df == 1 and rows["rare"].postings == "7"


def test_inverted_index_token_distinct_per_doc(spark):
    docs = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    rows = {r.token: r.df for r in inverted_index(docs, max_postings=5, min_df=1).collect()}
    assert rows == {"a": 1, "b": 1}  # document frequency, not term frequency


def test_source_overlap_pairs_ordered_and_counted(spark):
    docs = spark.createDataFrame(
        [
            (1, "s1", "a b c d"),   # grams: "a b c", "b c d"
            (2, "s2", "a b c"),     # gram:  "a b c"
            (3, "s3", "b c d x"),   # grams: "b c d", "c d x"
            (4, "s1", "a b c"),     # duplicate gram within s1 — distinct
        ],
        "doc_id long, source string, text string",
    )
    from optimal_parallel_fp_growth_spark.operators.ngrams import (
        source_ngram_overlap,
    )

    got = {
        (r.source_a, r.source_b): r.shared_grams
        for r in source_ngram_overlap(docs, n=3).collect()
    }
    assert got == {("s1", "s2"): 1, ("s1", "s3"): 1}
    assert all(a < b for a, b in got)  # unordered pairs, canonical order


def test_mix_by_temperature_shares(spark):
    from optimal_parallel_fp_growth_spark.operators.sampling import (
        mix_by_temperature,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    # alpha=0 equalizes: each source targeted at 200; 'small' (100 rows)
    # caps at keep-everything.
    out = mix_by_temperature(docs, target_total=400, alpha=0.0)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["small"] == 100  # rate capped at 1, nothing dropped
    assert 150 <= by_src["big"] <= 250  # ~200 of 900 kept, hash variance

    # determinism: same inputs → identical kept set
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in mix_by_temperature(docs, target_total=400, alpha=0.0).collect()
    )
    assert a == b


def test_mix_by_temperature_validation(spark):
    from optimal_parallel_fp_growth_spark.operators.sampling import (
        mix_by_temperature,
    )

    docs = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    with pytest.raises(ValueError, match="alpha"):
        mix_by_temperature(docs, target_total=10, alpha=2.0)
    with pytest.raises(ValueError, match="target_total"):
        mix_by_temperature(docs, target_total=-1)
    with pytest.raises(ValueError, match="keep_below"):
        mix_by_temperature(
            docs.withColumn("keep_below", docs.doc_id), target_total=10
        )


def test_plan_pins(spark, tiny_docs):
    gram_plan = ngram_counts(tiny_docs)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in gram_plan  # map-side combine before the shuffle

    idx_plan = inverted_index(tiny_docs)._jdf.queryExecution().executedPlan().toString()
    # Catalyst must keep the rank-filter rewrite: a Partial WindowGroupLimit
    # upstream of the Exchange bounds per-token posting shipping at 100 TB.
    assert idx_plan.count("WindowGroupLimit") == 2
    assert "Partial" in idx_plan


# ---------------------------------------------------------------------
# round 6: cross-document repeated-substring signal
# ---------------------------------------------------------------------


def test_repeated_spans_hand_case(spark):
    from optimal_parallel_fp_growth_spark.operators.ngrams import repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "p q r s t"),      # shares gram "p q r" with doc 2
            (2, "z p q r s"),      # shares "p q r" AND "q r s" w/ doc 1
            (3, "m m m m"),        # within-doc repeats only ("m m m" x2)
            (4, "u v"),            # shorter than a 3-gram
            (5, "lone gram here"), # one gram, unshared
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.repeated_occ, r.repeat_frac)
        for r in repeated_spans(docs, n=3, min_docs=2).collect()
    }
    # doc 1: grams {p q r, q r s, r s t}; p q r + q r s shared -> 2/3
    assert got[1] == (3, 2, round(2 / 3, 6))
    # doc 2: grams {z p q, p q r, q r s}; 2 shared -> 2/3
    assert got[2] == (3, 2, round(2 / 3, 6))
    # doc 3: "m m m" occurs twice but only in ONE document — min_docs
    # counts DISTINCT docs, so nothing is cross-corpus repeated
    assert got[3] == (2, 0, 0.0)
    # short and unshared docs report zeros, but ARE present
    assert got[4] == (0, 0, 0.0)
    assert got[5] == (1, 0, 0.0)


def test_repeated_spans_counts_occurrences_not_grams(spark):
    from optimal_parallel_fp_growth_spark.operators.ngrams import repeated_spans

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a")],  # "a b a" in both docs
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.repeated_occ)
        for r in repeated_spans(docs, n=3, min_docs=2).collect()
    }
    # doc 1 grams: a b a, b a b, a b a, b a b -> "a b a" occurs TWICE
    # and is shared; "b a b" occurs twice but only in doc 1
    assert got[1] == (4, 2)
    assert got[2] == (1, 1)


def test_repeated_spans_validation(spark, tiny_docs):
    import pytest as _pytest

    from optimal_parallel_fp_growth_spark.operators.ngrams import repeated_spans

    with _pytest.raises(ValueError, match="min_docs"):
        repeated_spans(tiny_docs, min_docs=1)
    with _pytest.raises(ValueError, match="n must"):
        repeated_spans(tiny_docs, n=0)


def test_repeated_spans_plan_map_side_combined(spark, tiny_docs):
    from optimal_parallel_fp_growth_spark.operators.ngrams import repeated_spans

    plan = (
        repeated_spans(tiny_docs)._jdf.queryExecution().executedPlan().toString()
    )
    # the (doc, gram) occurrence aggregate must partial-combine before
    # its exchange — the stage that bounds stop-gram skew at 100 TB
    assert "partial_count" in plan


# ---------------------------------------------------------------------------
# sep round-trips (round 16, VERDICT r15 task #5 / ADVICE r15): `sep`
# both tokenizes AND joins — previously the split was hardcoded to
# " " while the join honored sep, so any non-space sep mis-tokenized
# silently and remove_repeated_spans could never round-trip its input.


def test_ngram_counts_honors_tab_sep(spark):
    docs = spark.createDataFrame(
        [(1, "a\tb\tc"), (2, "a\tb")], "doc_id long, text string"
    )
    got = {
        r.gram: r.cnt
        for r in ngram_counts(docs, n=2, min_count=1, sep="\t").collect()
    }
    assert got == {"a\tb": 2, "b\tc": 1}


def test_ngram_counts_sep_is_literal_not_regex(spark):
    # "." and "|" are regex metacharacters: a raw F.split would
    # explode "a.b" into single characters
    docs = spark.createDataFrame([(1, "a.b.a.b")], "doc_id long, text string")
    got = {
        r.gram: r.cnt
        for r in ngram_counts(docs, n=2, min_count=1, sep=".").collect()
    }
    assert got == {"a.b": 2, "b.a": 1}


def test_remove_repeated_spans_tab_sep_round_trips(spark):
    from optimal_parallel_fp_growth_spark.operators.ngrams import (
        remove_repeated_spans,
    )

    boiler = "\t".join(f"b{i}" for i in range(6))
    docs = spark.createDataFrame(
        [
            (1, boiler + "\t" + "\t".join(f"u{i}" for i in range(4))),
            (2, boiler + "\t" + "\t".join(f"w{i}" for i in range(3))),
            (3, "clean\tdoc\twith\tno\trepeats"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in remove_repeated_spans(docs, n=6, sep="\t").collect()
    }
    # the shared 6-token boilerplate is removed from both carriers,
    # and the survivors re-join with the SAME tab separator
    assert out[1].text_clean == "\t".join(f"u{i}" for i in range(4))
    assert out[2].text_clean == "\t".join(f"w{i}" for i in range(3))
    assert out[1].n_removed == out[2].n_removed == 6
    # a clean doc ROUND-TRIPS its input exactly (split==join contract)
    assert out[3].text_clean == "clean\tdoc\twith\tno\trepeats"
    assert out[3].n_removed == 0


def test_split_tokens_rejects_quote_escape(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="sep"):
        ngram_counts(docs, n=1, min_count=1, sep="x\\Ey").collect()


def test_split_tokens_rejects_empty_sep(spark):
    # \Q\E matches the empty string — splitting between every character
    # and fabricating empty edge tokens (advice r16): raise instead
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        ngram_counts(docs, n=1, min_count=1, sep="").collect()
