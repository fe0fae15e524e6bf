"""End-to-end rolling-corpus composition: standing LSH index + Gopher
gate + incremental near-dup probe + versioned atomic commits — the
pieces an always-growing corpus pipeline chains per crawl, verified
together (each piece is unit/oracle-tested on its own)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.operators.dedup import (
    build_minhash_index,
    dedup_against_index,
    drop_minhash_index,
)
from optimal_parallel_fp_growth_spark.operators.textops import gopher_rules
from optimal_parallel_fp_growth_spark.sources.catalog import load_table
from optimal_parallel_fp_growth_spark.sources.versioned import (
    append_table,
    create_table,
    read_table,
    table_history,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_small):
    return load_table(spark, sf_small, "documents").select("doc_id", "text")


def test_crawl_rounds_accumulate_clean_docs(spark, corpus, tmp_path):
    # standing state: LSH index over the seed corpus + versioned table
    name = "inc_pipe_idx"
    build_minhash_index(corpus, name)
    try:
        tbl = str(tmp_path / "corpus_tbl")
        create_table(corpus, tbl)

        # crawl 1: half fresh docs (shifted ids, distinct text), half
        # exact clones of indexed docs (near-dup probes catch them)
        fresh = spark.createDataFrame(
            [
                (10_000 + i, " ".join(f"fresh{i}tok{j} extra{i}x{j}" for j in range(15)))
                for i in range(10)
            ],
            "doc_id long, text string",
        )
        clones = corpus.limit(5).select(
            (F.col("doc_id") + 20_000).alias("doc_id"), "text"
        )
        crawl = fresh.unionByName(clones)

        dups = dedup_against_index(crawl, name, threshold=0.9)
        dup_ids = {r.doc_id for r in dups.collect()}
        assert dup_ids == {r.doc_id for r in clones.collect()}

        survivors = crawl.join(
            dups.select("doc_id").distinct(), "doc_id", "left_anti"
        )
        # quality gate on the survivors (thresholds tuned to admit the
        # synthetic fresh docs: no stopwords in them by construction)
        gated = survivors.join(
            gopher_rules(
                survivors, min_words=10, min_stopword_hits=0
            ).where("keep").select("doc_id"),
            "doc_id",
            "left_semi",
        )
        assert gated.count() == 10  # all fresh docs pass, clones gone

        v = append_table(gated, tbl)
        assert v == 2
        assert read_table(spark, tbl).count() == corpus.count() + 10
        # time travel: the pre-crawl corpus is still exactly readable
        assert read_table(spark, tbl, version=1).count() == corpus.count()
        assert [h["op"] for h in table_history(tbl)] == ["create", "append"]
    finally:
        drop_minhash_index(spark, name)
