"""max_df stop-shingle pruning: identical jaccard values, subset recall."""

from __future__ import annotations

from optimal_parallel_fp_growth_spark.operators.dedup import ngram_jaccard_pairs
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def _pairs(df):
    return {(r.doc_a, r.doc_b): r.jaccard for r in df.collect()}


def test_max_df_pruning_is_exact_on_values_subset_on_pairs(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.2, max_df=0))
    huge = _pairs(ngram_jaccard_pairs(docs, threshold=0.2, max_df=10**9))
    pruned = _pairs(ngram_jaccard_pairs(docs, threshold=0.2, max_df=5))

    assert huge == exact  # max_df beyond every df == exact tier
    assert set(pruned) <= set(exact)  # pruning only loses pairs
    for pair, j in pruned.items():
        assert j == exact[pair]  # surviving values identical


def test_default_max_df_is_auto_and_exact_at_small_scale(spark, sf_small):
    """The DEFAULT is now the auto-derived cutoff (VERDICT r4 task #3);
    at small corpora the floor (50) exceeds every shingle df, so the
    default must reproduce the exact tier bit-for-bit."""
    docs = load_table(spark, sf_small, "documents")
    auto = _pairs(ngram_jaccard_pairs(docs, threshold=0.2))
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=0.2, max_df=0))
    assert auto == exact and auto


def test_ngram_max_df_recipe():
    from optimal_parallel_fp_growth_spark.operators.dedup import (
        NGRAM_MAX_DF_FLOOR,
        ngram_max_df_for,
    )

    assert ngram_max_df_for(0) == NGRAM_MAX_DF_FLOOR
    assert ngram_max_df_for(500) == 50       # floor: sf0.01 stays exact
    assert ngram_max_df_for(2500) == 50      # ceil(sqrt)=50 == floor
    assert ngram_max_df_for(2501) == 51      # first step past the floor
    assert ngram_max_df_for(50_000) == 224   # sf1 ≈ measured max_df=200
    assert ngram_max_df_for(500_000) == 708  # sf10: df² stays ≤ n


# ---------------------------------------------------------------------------
# 64-bit simhash scale path


def _brute_hamming(fps):
    out = {}
    for i, (da, fa) in enumerate(fps):
        for db, fb in fps[i + 1 :]:
            a, b = sorted((da, db))
            out[(a, b)] = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
    return out


def test_simhash_width_is_64_with_16bit_bands():
    from optimal_parallel_fp_growth_spark.operators import dedup

    assert dedup.SIMHASH_BITS == 64
    assert dedup.SIMHASH_BAND_BITS == 16
    assert dedup.SIMHASH_BANDS == 4


def test_simhash_fingerprints_use_full_64_bits(spark, sf_small):
    """High half must carry entropy — a 32-bit regression would zero it."""
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.operators.dedup import simhash_fingerprints

    docs = load_table(spark, sf_small, "documents")
    fps = simhash_fingerprints(docs)
    hi = fps.select(
        F.sum(
            (F.shiftrightunsigned(F.col("fp"), 32) > 0).cast("int")
        ).alias("n_hi")
    ).collect()[0]
    assert hi.n_hi > 0


def test_simhash_recall_guarantee_hamming_le_3(spark, sf_small):
    """Pigeonhole: ≤3 differing bits across 4 bands leaves ≥1 band equal,
    so every hamming≤3 pair MUST surface as a band-join candidate."""
    from optimal_parallel_fp_growth_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    docs = load_table(spark, sf_small, "documents")
    fps = [(r.doc_id, r.fp) for r in simhash_fingerprints(docs).collect()]
    truth = {p: h for p, h in _brute_hamming(fps).items() if h <= 3}
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    assert got == truth


def test_simhash_candidate_volume_bounded_on_dissimilar_corpus(spark):
    """Uniform (dissimilar) docs: expected band collisions are
    ~4·C(n,2)/2^16 ≈ 3 for n=300 — assert candidates ≪ all-pairs, the
    property the 8-bit width lost (O(n²/256) saturated at toy scale)."""
    import random

    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.operators import dedup

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"w{rng.randrange(10**9)}" for _ in range(40)))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = dedup.simhash_fingerprints(docs)
    mask = (1 << dedup.SIMHASH_BAND_BITS) - 1
    bands = fps.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.shiftright(F.col("fp"), b * dedup.SIMHASH_BAND_BITS)
                    .bitwiseAND(F.lit(mask))
                    .alias("v")
                    for b in range(dedup.SIMHASH_BANDS)
                ]
            )
        ).alias("band_val"),
    )
    # collisions per band value across the corpus ⇒ candidate pair count
    n_cand = (
        bands.groupBy("band_val")
        .count()
        .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c"))
        .collect()[0]
        .c
    )
    all_pairs = 300 * 299 / 2
    assert n_cand < 0.01 * all_pairs


# ---------------------------------------------------------------------------
# minhash signature-estimate verify (100 TB payload path)


def test_minhash_signature_verify_estimates_exact(spark, sf_small):
    """verify='signatures' must produce a subset-compatible pair set
    with jaccard estimated by signature agreement: same LSH candidates,
    estimate within the minhash stderr envelope of the exact value."""
    from optimal_parallel_fp_growth_spark.operators.dedup import (
        NUM_HASHES,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_small, "documents")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    est = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs, threshold=0.0, verify="signatures"
        ).collect()
    }
    # identical candidate pairs at threshold 0 (same bands, same join)
    assert set(est) == set(exact)
    # estimates are k-quantized and track exact values distributionally:
    # a 16-hash estimator has stderr ~0.12 per pair (plus linear-mix
    # family bias), so bound the aggregate error, not each pair.
    errs = sorted(abs(e - exact[p]) for p, e in est.items())
    mae = sum(errs) / len(errs)
    assert mae <= 0.125, mae                       # ~2/16 average
    assert errs[int(0.9 * len(errs))] <= 0.25     # p90 within 4/16
    assert errs[-1] <= 0.5                        # no catastrophic miss
    for e in est.values():
        assert abs(e * NUM_HASHES - round(e * NUM_HASHES)) < 1e-6


def test_minhash_signature_verify_plan_avoids_shingle_arrays(spark, sf_small):
    """The verify joins in signature mode must not ship shingle sets -
    no array_intersect/array_union in the physical plan."""
    from optimal_parallel_fp_growth_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_small, "documents")
    plan_sig = minhash_lsh_pairs(
        docs, verify="signatures"
    )._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" not in plan_sig
    assert "array_union" not in plan_sig
    plan_exact = minhash_lsh_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" in plan_exact  # control


def test_minhash_verify_validates(spark, sf_small):
    import pytest

    from optimal_parallel_fp_growth_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_small, "documents")
    with pytest.raises(ValueError, match="verify"):
        minhash_lsh_pairs(docs, verify="bogus")


# ---------------------------------------------------------------------------
# eval-set decontamination


def test_decontaminate_hand_values(spark):
    from optimal_parallel_fp_growth_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),     # shares "the quick brown",
                                                  # "quick brown fox", "brown fox jumps"
            (2, "a quick brown fox appears"),     # shares "quick brown fox"
            (3, "nothing in common here at all"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.eval_id): r.n_shared
        for r in decontaminate(train, ev, k=3, min_hits=1).collect()
    }
    assert got == {(1, 100): 3, (2, 100): 1}
    # min_hits raises the bar
    strict = {
        (r.doc_id, r.eval_id): r.n_shared
        for r in decontaminate(train, ev, k=3, min_hits=2).collect()
    }
    assert strict == {(1, 100): 3}


def test_decontaminate_broadcasts_eval_postings(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.dedup import decontaminate

    docs = load_table(spark, sf_small, "documents")
    ev = docs.limit(5)
    plan = (
        decontaminate(docs, ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
