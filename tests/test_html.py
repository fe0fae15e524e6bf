"""HTML main-content extraction (operators/html.py): parser block
census, link-density gate, escaping round trip, and the distributed
pipeline."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.operators.html import (
    attach_html,
    extract_main_text,
    extract_page_blocks,
)
from optimal_parallel_fp_growth_spark.sources.catalog import load_table


def test_block_census_and_link_density_on_handmade_page():
    page = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><nav><a href='/'>Home</a> <a href='/x'>More</a></nav>"
        "<article><p>Real article text, long enough to keep.</p>"
        "<p>Second paragraph with <a href='/in'>one link</a> inline.</p>"
        "</article>"
        "<script>var x = 'not text';</script>"
        "<footer><a href='/t'>Terms</a></footer></body></html>"
    )
    blocks = extract_page_blocks(page)
    tags = [b["tag"] for b in blocks]
    # head (title+style) and script dropped wholesale
    assert tags == ["nav", "p", "p", "footer"]
    nav, p1, p2, footer = blocks
    assert nav["link_chars"] == len("Home") + len("More")
    assert p1["link_chars"] == 0
    assert p2["link_chars"] == len("one link")
    assert footer["link_chars"] == footer["chars"] == len("Terms")


def test_entity_unescape_and_whitespace_normalization():
    page = "<body><p>a &amp; b &lt;c&gt;   d\n e</p></body>"
    (b,) = extract_page_blocks(page)
    assert b["text"] == "a & b <c> d e"


def test_gate_drops_short_and_linky_blocks():
    page = (
        "<body><p>tiny</p>"
        "<p><a href='/'>all of this text is a link</a></p>"
        "<p>this block is long enough and plain</p></body>"
    )
    import pandas as pd  # noqa: F401  (exercise import path parity)

    blocks = extract_page_blocks(page)
    kept = [
        b
        for b in blocks
        if b["chars"] >= 8 and b["link_chars"] / b["chars"] <= 0.33
    ]
    assert [b["text"] for b in kept] == ["this block is long enough and plain"]


def test_pipeline_round_trips_document_text(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    out = {r.doc_id: r for r in extract_main_text(attach_html(docs)).collect()}
    assert len(out) == len(texts)
    for doc_id, r in out.items():
        assert r.n_blocks == 5 and r.n_kept == 1
        assert r.main_text == texts[doc_id]  # exact recovery
        assert r.n_chars == len(texts[doc_id])
        ld = (37 + 2 * len(str(doc_id))) / (
            52 + 2 * len(str(doc_id)) + len(texts[doc_id])
        )
        assert abs(r.link_density - round(ld, 6)) < 1e-9


def test_extract_validates_gate_param(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    with pytest.raises(ValueError):
        extract_main_text(attach_html(docs), max_link_density=1.5)


def test_fixture_corpus_satisfies_oracle_equality_preconditions(
    spark, sf_small, sf_oracle
):
    """ORACLE_HTML_EXTRACT states ``main_text = text`` in closed form,
    which holds ONLY while the fixture generator emits single-space-
    tokenized text of >= min_chars (the parser's _flush collapses
    whitespace runs, and shorter articles would fall to the length
    gate). That invariant was implicit (ADVICE r7 low / VERDICT r8
    what's-wrong #3) — pin it here so a fixture-generator change breaks
    THIS test with a readable message instead of silently flipping the
    driver's oracle gate."""
    from pyspark.sql import functions as F

    for sf_dir in (sf_small, sf_oracle):
        docs = load_table(spark, sf_dir, "documents")
        bad = (
            docs.where(
                (
                    F.col("text")
                    != F.array_join(
                        F.filter(
                            F.split("text", " "), lambda t: t != F.lit("")
                        ),
                        " ",
                    )
                )
                | F.col("text").rlike(r"[\t\n\r]")
                | (F.length("text") < 8)
            )
            .select("doc_id")
            .limit(5)
            .collect()
        )
        assert not bad, (
            f"{sf_dir}: docs {[r.doc_id for r in bad]} violate the "
            "html_extract oracle precondition (single-space-tokenized "
            "text >= 8 chars) — re-derive ORACLE_HTML_EXTRACT before "
            "trusting the gate"
        )
