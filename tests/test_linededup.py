"""Line-level boilerplate dedup (operators/linededup.py)."""

from __future__ import annotations

import pytest

from optimal_parallel_fp_growth_spark.operators.linededup import (
    dedup_lines_from,
    remove_repeated_lines,
)


@pytest.fixture(scope="module")
def boiler_docs(spark):
    # "FOOTER" appears in 3 docs, "MENU" in 2, unique lines elsewhere;
    # doc 4 is 100% boilerplate; doc 3 repeats FOOTER internally (the
    # within-doc repeat counts once toward the distinct-doc threshold)
    rows = [
        (1, "alpha\nMENU\nbravo\nFOOTER"),
        (2, "charlie\nFOOTER\nMENU"),
        (3, "delta\nFOOTER\nFOOTER\necho"),
        (4, "FOOTER"),
        (5, "foxtrot"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_repeated_lines(boiler_docs):
    out = {
        r.doc_id: r for r in remove_repeated_lines(boiler_docs).collect()
    }
    assert out[1].clean_text == "alpha\nbravo"
    assert (out[1].n_lines, out[1].n_removed) == (4, 2)
    assert out[2].clean_text == "charlie"
    assert out[3].clean_text == "delta\necho"
    assert out[3].n_removed == 2  # both internal FOOTER copies go
    # fully-boilerplate doc survives as an empty row, not a dropped row
    assert out[4].clean_text == "" and out[4].n_removed == 1
    assert out[5].clean_text == "foxtrot" and out[5].n_removed == 0


def test_within_doc_repeat_alone_is_not_boilerplate(spark):
    docs = spark.createDataFrame(
        [(1, "chorus\nverse\nchorus"), (2, "bridge")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_lines(docs).collect()}
    # "chorus" repeats only inside doc 1 -> kept (distinct-doc count 1)
    assert out[1].clean_text == "chorus\nverse\nchorus"
    assert out[1].n_removed == 0


def test_min_docs_threshold(boiler_docs):
    out = {
        r.doc_id: r
        for r in remove_repeated_lines(boiler_docs, min_docs=3).collect()
    }
    # only FOOTER reaches 3 distinct docs; MENU (2) survives
    assert out[1].clean_text == "alpha\nMENU\nbravo"
    assert out[2].clean_text == "charlie\nMENU"
    with pytest.raises(ValueError, match="min_docs"):
        remove_repeated_lines(boiler_docs, min_docs=1)


def test_literal_separator_not_regex(spark):
    docs = spark.createDataFrame(
        [(1, "a.b.a"), (2, "b.c")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in remove_repeated_lines(docs, sep=".").collect()
    }
    # "." must split literally: b appears in both docs -> removed
    assert out[1].clean_text == "a.a"
    assert out[2].clean_text == "c"


def test_core_on_pre_split_lines(spark):
    lines = spark.createDataFrame(
        [(1, 0, "x"), (1, 1, "boiler"), (2, 0, "boiler"), (2, 1, "y")],
        "doc_id long, pos int, line string",
    )
    out = {r.doc_id: r for r in dedup_lines_from(lines).collect()}
    assert out[1].clean_text == "x" and out[2].clean_text == "y"


def test_reassembly_preserves_position_order(spark):
    # many lines, shuffled insert order — output must follow pos
    lines = [(1, p, f"line{p:03d}") for p in range(40)]
    df = spark.createDataFrame(
        list(reversed(lines)), "doc_id long, pos int, line string"
    ).repartition(8)
    out = dedup_lines_from(df).collect()[0]
    assert out.clean_text == "\n".join(f"line{p:03d}" for p in range(40))
