"""Chunking / packing / tf-idf unit tests (oracle parity is covered by
the driver gate; these pin edge-case semantics)."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunk_short_doc_single_chunk(spark):
    docs = _docs(spark, [(1, "a", "x y z")])
    rows = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.chunk_idx, r.n_tokens, r.chunk_text) == (0, 3, "x y z")


def test_chunk_boundaries_and_overlap(spark):
    # 10 tokens, chunk 4, overlap 1 -> stride 3 -> starts 1,4,7
    # (1 + ceil((10-4)/3) = 3 chunks; the third reaches the last token)
    text = " ".join(f"t{i}" for i in range(1, 11))
    docs = _docs(spark, [(1, "a", text)])
    rows = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_idx,
    )
    texts = [r.chunk_text for r in rows]
    assert texts == ["t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"]
    # every token appears; consecutive chunks overlap by exactly 1
    for a, b in zip(texts, texts[1:]):
        assert a.split()[-1] == b.split()[0]


def test_chunk_coverage_no_token_lost(spark, sf_small):
    from pyspark.sql import functions as F

    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    # stride-12 chunks of every doc must cover exactly ceil pattern and
    # reconstruct the token count: sum(sizes) - overlaps == n_tokens
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("n_tokens").alias("sum_chunks"),
            F.count("*").alias("n_chunks"),
        )
        .join(
            docs.select(
                "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
            ),
            "doc_id",
        )
    )
    bad = per_doc.where(
        F.col("sum_chunks") - 4 * (F.col("n_chunks") - 1) != F.col("n_tokens")
    ).count()
    assert bad == 0


def test_chunk_validates(spark):
    docs = _docs(spark, [(1, "a", "x")])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0)


def test_pack_contiguous_fill(spark):
    # group a: docs of 3,3,3 tokens, budget 5 -> starts 0,3,6 -> packs 0,0,1
    docs = _docs(
        spark,
        [
            (1, "a", "x x x"),
            (2, "a", "y y y"),
            (3, "a", "z z z"),
            (4, "b", "w w w w w w"),
            (5, "b", "v"),
        ],
    )
    got = {r.doc_id: r.pack_id for r in pack_sequences(docs, budget=5).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0, 5: 1}


def test_pack_deterministic_across_partitionings(spark):
    rows = [(i, f"s{i % 3}", " ".join(["w"] * (i % 7 + 1))) for i in range(60)]
    docs = _docs(spark, rows)
    base = sorted(map(tuple, pack_sequences(docs, budget=8).collect()))
    re7 = sorted(
        map(tuple, pack_sequences(docs.repartition(7), budget=8).collect())
    )
    assert base == re7


def test_pack_validates(spark):
    docs = _docs(spark, [(1, "a", "x")])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, budget=0)


def test_tfidf_hand_values(spark):
    from optimal_parallel_fp_growth_spark.operators.textops import tfidf_top_terms

    docs = _docs(
        spark,
        [
            (1, "a", "apple apple banana"),
            (2, "a", "banana cherry"),
            (3, "a", "cherry cherry cherry"),
        ],
    )
    import math

    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: apple tf=2 idf=ln(3/1) -> top; banana tf=1 idf=ln(3/2)
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in d1] == ["apple", "banana"]
    assert abs(d1[0].score - round(2 * math.log(3 / 1), 6)) < 1e-9
    assert abs(d1[1].score - round(1 * math.log(3 / 2), 6)) < 1e-9
    # doc 3: cherry tf=3 idf=ln(3/2)
    d3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert d3[0].term == "cherry"
    assert abs(d3[0].score - round(3 * math.log(3 / 2), 6)) < 1e-9


def test_tfidf_join_strategy_not_load_bearing(spark, sf_small):
    """VERDICT r3 task #6: the |vocab|-sized df join must work (and
    agree) under BOTH strategies — broadcast for small corpora, shuffle
    join for vocabularies above the broadcast threshold — and the
    default must let AQE pick (broadcast at this scale)."""
    from optimal_parallel_fp_growth_spark.operators.textops import tfidf_top_terms
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    docs = load_table(spark, sf_small, "documents")
    auto = tfidf_top_terms(docs, k=3)
    shuffled = tfidf_top_terms(docs, k=3, broadcast_df=False)
    rows_auto = sorted(map(tuple, auto.collect()))
    rows_shuffled = sorted(map(tuple, shuffled.collect()))
    assert rows_auto == rows_shuffled and rows_auto
    # after execution the AQE final plan for the default path broadcasts
    # the small df side; the pinned fallback keeps a shuffle join
    plan_auto = auto._jdf.queryExecution().executedPlan().toString()
    plan_shuffled = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_auto
    assert "SortMergeJoin" in plan_shuffled or "ShuffledHashJoin" in plan_shuffled


def test_tfidf_topk_window_is_two_phase(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.textops import tfidf_top_terms
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    plan = (
        tfidf_top_terms(load_table(spark, sf_small, "documents"), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The property: the per-doc top-k limit is pushed below the window
    # (InferWindowGroupLimit), so no task ever buffers a document's
    # full posting list. Two legal shapes: Partial+Final around the
    # window's exchange, or — since the round-17 fan_out_scan keys the
    # scan repartition on doc_id, which the window reuses, leaving NO
    # exchange between the count aggregate and the window — a single
    # Final WindowGroupLimit (strictly better: one shuffle fewer). In
    # the second shape, assert structurally that nothing re-shuffles
    # on the plan SPINE between the window limit and the (doc, term)
    # aggregate (side branches, ':'-prefixed, may exchange freely).
    assert "WindowGroupLimit" in plan
    if "Partial" not in plan:
        lines = plan.splitlines()
        start = next(
            i for i, ln in enumerate(lines) if "WindowGroupLimit" in ln
        )
        def _is_side_branch(ln: str) -> bool:
            # a ':' in the tree-drawing prefix marks a side branch —
            # those may exchange freely (ADVICE r17: the old collector
            # would falsely fail on a doc_id exchange there)
            idx = 0
            while idx < len(ln) and ln[idx] in " :+-":
                idx += 1
            return ":" in ln[:idx]

        between = []
        for ln in lines[start + 1:]:
            if "HashAggregate(keys=[doc_id" in ln and not _is_side_branch(ln):
                break
            if not _is_side_branch(ln):
                between.append(ln)
        # a doc_id re-shuffle here would mean per-doc posting rows
        # crossing an exchange above the (doc, term) aggregate — the
        # exact cost the two-phase limit exists to avoid
        assert not any(
            "Exchange hashpartitioning(doc_id" in ln for ln in between
        ), plan


# ---------------------------------------------------------------------------
# property tests: chunk/pack invariants under random shapes

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.integers(min_value=1, max_value=60),
    chunk=st.integers(min_value=2, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_invariants(spark, n_tokens, chunk, overlap_frac):
    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    text = " ".join(f"w{i}" for i in range(n_tokens))
    docs = spark.createDataFrame(
        [(1, "s", text)], "doc_id long, source string, text string"
    )
    rows = sorted(
        chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    # chunk count matches the closed form
    expected_n = 1 + max(0, -(-(n_tokens - chunk) // stride))
    assert len(rows) == expected_n
    # indices contiguous from 0; all chunks full except possibly the last
    assert [r.chunk_idx for r in rows] == list(range(expected_n))
    assert all(r.n_tokens == chunk for r in rows[:-1])
    assert 1 <= rows[-1].n_tokens <= chunk
    # exact coverage: chunk i starts at token i*stride
    toks = text.split()
    for r in rows:
        start = r.chunk_idx * stride
        assert r.chunk_text.split() == toks[start : start + chunk]
    # last chunk reaches the final token
    assert rows[-1].chunk_text.split()[-1] == toks[-1]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=25),
    budget=st.integers(min_value=5, max_value=60),
)
def test_pack_invariants(spark, sizes, budget):
    docs = spark.createDataFrame(
        [(i, "g", " ".join(["w"] * n)) for i, n in enumerate(sizes)],
        "doc_id long, source string, text string",
    )
    rows = sorted(
        pack_sequences(docs, budget=budget).collect(), key=lambda r: r.doc_id
    )
    # reference: sequential contiguous fill in doc_id order
    start = 0
    for r, n in zip(rows, sizes):
        assert r.n_tokens == n
        assert r.pack_id == start // budget
        start += n
    # pack ids are non-decreasing; gaps are legal (a doc longer than
    # the budget advances the start offset past whole packs)
    ids = [r.pack_id for r in rows]
    assert ids == sorted(ids)
    assert ids[0] == 0


# ---------------------------------------------------------------------------
# PII detection / redaction


def test_pii_stats_and_redaction(spark):
    from optimal_parallel_fp_growth_spark.operators.pii import (
        pii_stats,
        redact_pii,
    )

    docs = spark.createDataFrame(
        [
            (1, "contact a.b+c@x-y.co.uk and bob@test.io now"),
            (2, "call +555-123-4567 or 555 987 6543"),
            (3, "server at 10.0.255.1 responded"),
            (4, "perfectly clean text"),
        ],
        "doc_id long, text string",
    )
    stats = {r.doc_id: r for r in pii_stats(docs).collect()}
    assert (stats[1].n_email, stats[1].has_pii) == (2, True)
    assert (stats[2].n_phone, stats[2].has_pii) == (2, True)
    assert (stats[3].n_ip, stats[3].has_pii) == (1, True)
    assert (stats[4].n_email, stats[4].n_phone, stats[4].n_ip,
            stats[4].has_pii) == (0, 0, 0, False)

    red = {r.doc_id: r.text_redacted for r in redact_pii(docs).collect()}
    assert red[1] == "contact <EMAIL> and <EMAIL> now"
    assert red[2] == "call <PHONE> or <PHONE>"
    assert red[3] == "server at <IP> responded"
    assert red[4] == "perfectly clean text"


def test_pii_plan_is_single_scan_no_python(spark, sf_small):
    from optimal_parallel_fp_growth_spark.operators.pii import pii_stats
    from optimal_parallel_fp_growth_spark.sources.catalog import load_table

    plan = (
        pii_stats(load_table(spark, sf_small, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
