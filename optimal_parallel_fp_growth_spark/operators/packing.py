"""Sequence chunking and packing — the final shaping stage of an LLM
training-data pipeline (no reference counterpart; driver north star):
documents become fixed-token-window chunks, chunks get packed into
fixed token budgets.

Both are pure built-in DataFrame plans:

- ``chunk_documents`` is a narrow projection + explode over one scan —
  no shuffle at all; chunk boundaries are a closed-form function of the
  token count, so the operator parallelizes embarrassingly at any
  corpus size.
- ``pack_sequences`` assigns documents to contiguous fixed-budget packs
  with a cumulative-sum window per group. The window is partitioned by
  the grouping column (source/shard/language), which is the scale
  contract: pack construction is only ever sequential WITHIN a group,
  so groups bound both the shuffle key cardinality and the per-reducer
  row count. A global (ungrouped) pack order would serialize the whole
  corpus through one reducer — deliberately not offered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap.
    → (doc_id, chunk_idx, n_tokens, chunk_text).

    Chunk i covers tokens [1 + i·stride, 1 + i·stride + chunk_tokens)
    with stride = chunk_tokens − overlap; the last chunk is the first
    one whose window reaches the final token (it may be short). A
    document of ≤ chunk_tokens tokens yields exactly one chunk.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = docs.select("doc_id", tokens(text_col).alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n")
    )
    # chunks needed: 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.col("n") - chunk_tokens, F.lit(0)) / stride
    ).cast("int")
    return (
        toks.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice(
                F.col("toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
            ).alias("__chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("__chunk").alias("n_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to contiguous fixed-budget packs within each
    group. → (doc_id, group, n_tokens, pack_id).

    Deterministic contiguous fill: within a group, documents are taken
    in doc_id order and a document belongs to the pack its starting
    token offset falls in — pack_id = floor(start_offset / budget)
    where start_offset is the cumulative token count of all earlier
    documents in the group. Documents may straddle a budget boundary
    (they are not split; pair with :func:`chunk_documents` first when
    hard caps are needed), and a document longer than the budget
    advances the offset past whole packs, so pack ids within a group
    can skip values. Everything is integer arithmetic over a
    per-group running sum, so re-runs and retries produce identical
    packs on any cluster size.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    counted = docs.select(
        "doc_id",
        F.col(group_col).alias("group"),
        F.size(tokens(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return counted.select(
        "doc_id",
        "group",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("pack_id"),
    )
