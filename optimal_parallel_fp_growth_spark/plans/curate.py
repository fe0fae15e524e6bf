"""End-to-end corpus curation pipeline — the composition a training-data
user actually runs: dedup → quality filter → split → sequence packing,
as ONE declarative plan Catalyst optimizes jointly (driver north star;
no reference counterpart).

Stage order is dedup-first (survivors are canonical representatives),
then the cheap quality gate, then the deterministic md5 split, and
packing only over the train split. Every stage is an existing
oracle-checked operator, so the composed DuckDB oracle is the same
CTEs chained — the pipeline adds no new semantics, only composition.

Scale: the expensive stage is minhash dedup (banded LSH, analyzed in
EXPLAIN.md); everything downstream is scan-shaped projections/filters
plus one per-source window for packing. Because it is a single logical
plan, Catalyst pushes the split filter below the pack window's exchange
and prunes text early — no materialization between stages unless the
caller persists.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.dedup import deduped_corpus
from optimal_parallel_fp_growth_spark.operators.packing import pack_sequences
from optimal_parallel_fp_growth_spark.operators.sampling import corpus_split
from optimal_parallel_fp_growth_spark.operators.textops import quality_score

DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.9),
    ("val", 0.05),
    ("test", 0.05),
)


def curate_corpus(
    docs: DataFrame,
    quality_min: float = 0.5,
    dedup_threshold: float = 0.5,
    split_weights: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    train_split: str = "train",
    budget: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Curated, packed training corpus: documents that survive exact +
    minhash dedup AND score ≥ quality_min, assigned to splits, with the
    train split packed into fixed-budget sequences.
    → (doc_id, source, n_tokens, pack_id).
    """
    surv = deduped_corpus(docs, text_col=text_col, threshold=dedup_threshold)
    qual = quality_score(docs, text_col=text_col)
    kept_ids = (
        surv.join(qual, "doc_id")
        .where(F.col("quality") >= quality_min)
        .select("doc_id")
    )
    kept = docs.join(kept_ids, "doc_id", "left_semi")
    train = corpus_split(kept, weights=tuple(split_weights)).where(
        F.col("split") == train_split
    )
    packed = pack_sequences(train, budget=budget, group_col="source",
                            text_col=text_col)
    return packed.select(
        "doc_id", F.col("group").alias("source"), "n_tokens", "pack_id"
    )
