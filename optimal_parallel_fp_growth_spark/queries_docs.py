"""Document-pipeline query registry — text analysis + deduplication over
the ``documents`` table (driver north-star extensions, SURVEY §7.2 M7).

Oracles are generated from the same constants the Spark operators use
(LANG_MARKERS / EN_STOPWORDS / TOKEN_REGEX / minhash params), so both
sides stay in lock-step by construction. Every hash is md5-derived,
which DuckDB reproduces bit-for-bit ('0x'||hex cast, verified).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.text import (
    EN_STOPWORDS,
    LANG_MARKERS,
    TOKEN_REGEX,
)
from optimal_parallel_fp_growth_spark.operators import dedup, ngrams, sampling, textops
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

# Shared by the Spark query and its oracle (lock-step by construction).
SPLIT_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("train", 0.9),
    ("val", 0.05),
    ("test", 0.05),
)
MIX_RATES: dict[str, float] = {"src0": 0.5, "src3": 0.25, "src7": 0.0}


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------------
# Spark-side queries


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.text_stats(load_table(spark, sf_dir, "documents"))


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.repetition_signals(load_table(spark, sf_dir, "documents"))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=5)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.operators.packing import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=16, overlap=4
    )


def q_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.operators.pii import pii_stats

    return pii_stats(load_table(spark, sf_dir, "documents"))


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII REDACTION under the oracle gate (round 13): the compliance
    transform next to the r9 detection stats — every email/phone/IP
    match replaced with its typed placeholder, compared STRING-EXACT
    per document against DuckDB applying the same pattern sequence
    (the patterns live in the engine-common regex subset; see
    operators/pii.py). Single-scan narrow projection, whole-stage
    codegen — the only acceptable shape for a pass that must touch
    every byte of a 100 TB corpus."""
    from optimal_parallel_fp_growth_spark.operators.pii import redact_pii

    return redact_pii(load_table(spark, sf_dir, "documents"))


def _pii_redact_sql() -> str:
    from optimal_parallel_fp_growth_spark.operators.pii import PII_PATTERNS

    expr = "text"
    for name, pat in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '<{name.upper()}>', 'g')"
    return f"SELECT doc_id, {expr} AS text_redacted FROM documents"


ORACLE_PII_REDACT = _pii_redact_sql()


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization under the oracle gate (round 13):
    NFC composition (one Arrow pandas UDF — CPython unicodedata and
    DuckDB's utf8proc both implement UAX #15, probed equal), control
    chars to spaces and whitespace collapse JVM-side, compared
    STRING-EXACT per document."""
    from optimal_parallel_fp_growth_spark.operators.textops import (
        normalize_text,
    )

    return normalize_text(load_table(spark, sf_dir, "documents"))


ORACLE_NORMALIZE_TEXT = r"""
SELECT doc_id,
       trim(regexp_replace(
         regexp_replace(nfc_normalize(text), '[\x00-\x1f\x7f]', ' ', 'g'),
         '\s+', ' ', 'g')) AS text_norm
FROM documents
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.operators.packing import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"), budget=256)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination with every 50th document standing in as
    the benchmark set; self-matches excluded."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 50 == 0)
    return dedup.decontaminate(docs, ev, k=3, min_hits=2).where(
        F.col("doc_id") != F.col("eval_id")
    )


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination as a bloom-pruned SEMI join: ids of training
    documents (doc_id % 50 != 0) sharing at least one word trigram with
    the eval set. The corpus-side posting stream is prefiltered by a
    broadcast Bloom bitmap over the eval shingles — only suspect
    postings reach the exact membership join, so the output is exact
    for any fpp while the corpus never shuffles."""
    from optimal_parallel_fp_growth_spark.functions.caching import (
        tag_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.operators.bloom import bloom_semi_join

    # Two load-bearing details. (1) The fixture is one parquet split,
    # which would serialize the tokenize→shingle chain; a real 100 TB
    # input fans out at the scan, so re-split the raw docs (a few MB
    # here) to get the cluster-shaped stage. (2) Persist the shingle
    # frame: it feeds three subtrees (train probe, bloom build,
    # verify keys), and the persist barrier also stops
    # InferFiltersFromGenerate from inlining the full shingle
    # expression into a filter UNDER the exchange — which would
    # re-tokenize quadratically inside the serial scan task (the
    # `_doc_shingles` O(tokens²) hazard, measured 6.7 s of the
    # original 15.9 s).
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sh = dedup._doc_shingles(docs, "text", 3)
    sh.persist()
    train = sh.where(F.col("doc_id") % 50 != 0).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    ev = sh.where(F.col("doc_id") % 50 == 0).select(
        F.explode("sh").alias("shingle")
    )
    hit = bloom_semi_join(train, ev, "shingle", fpp=0.01, broadcast_verify=True)
    return tag_cached_inputs(hit.select("doc_id").distinct(), sh)


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate over the corpus: per-rule verdicts +
    conjunctive keep, one codegen'd projection."""
    return textops.gopher_rules(load_table(spark, sf_dir, "documents"))


def q_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-pair mining, k=2 per document (md5
    bucket probe + tiebreak pick — no rand(), oracle reproduces every
    pair)."""
    return sampling.negative_pairs(load_table(spark, sf_dir, "documents"), k=2)


ORACLE_NEGATIVE_PAIRS = """
WITH bsz AS (SELECT greatest(1, count(*) // 8) AS b FROM documents),
probes AS (SELECT doc_id AS i, j,
                  ('0x' || substr(md5('neg:p:' || j::VARCHAR || ':' || doc_id::VARCHAR), 1, 8))::BIGINT
                  % (SELECT b FROM bsz) AS bucket
           FROM documents, (SELECT unnest(range(2)) AS j)),
targets AS (SELECT doc_id AS t,
                   ('0x' || substr(md5('neg:t:' || doc_id::VARCHAR), 1, 8))::BIGINT
                   % (SELECT b FROM bsz) AS bucket
            FROM documents),
cand AS (SELECT i, j, t,
                md5('neg:x:' || i::VARCHAR || ':' || j::VARCHAR || ':' || t::VARCHAR) AS tb
         FROM probes JOIN targets USING (bucket) WHERE t <> i)
SELECT i AS doc_id, j::INT AS pair_idx, min_by(t, tb) AS neg_id
FROM cand GROUP BY 1, 2
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_score(load_table(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.lang_id(load_table(spark, sf_dir, "documents"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.doc_fingerprint(load_table(spark, sf_dir, "documents"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_exact(load_table(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default (auto max_df) tier — the scale-safe path users get with
    no knob; the oracle mirrors ``ngram_max_df_for`` as a scalar
    subquery so the row stays green at every sf."""
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), k=2, threshold=0.2
    )


def q_dedup_ngram_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tier (``max_df=0``): no stop-shingle pruning — the
    verification setting (spills at sf1+, BASELINE.md §sf1)."""
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), k=2, threshold=0.2, max_df=0
    )


def q_dedup_ngram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filter exact near-dup tier at τ=0.8 (the high-τ regime
    prefix filtering is FOR; operator docstring records the measured
    verdict on this dense-vocab fixture). Same shingle/jaccard
    contract as the exact tier, thresholded at 0.8."""
    return dedup.ngram_jaccard_prefix(
        load_table(spark, sf_dir, "documents"), k=2, threshold=0.8
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), k=2, threshold=0.2
    )


# --- Zipf skew-stress entry (round 11, VERDICT r10 #7) ----------------------
# The benchmark documents table has a DENSE shingle vocabulary (mean
# df ≈ 275, no rare tail), so no registry entry exercised heavy-hitter
# skew under the oracle gate. This entry manufactures a heavy-tailed
# corpus IN-QUERY from doc_id with integer-only arithmetic both engines
# state identically (no doubles — cross-engine pow() rounding could
# flip a token at a ceil boundary): h is a Lehmer-style LCG step, and
# token rank t = ceil(V/x) for x uniform on 1..V gives P(t) ∝ 1/t² —
# a Zipf-2 head where the hottest token covers ~half of ALL positions
# (df ≈ n_docs: the worst heavy hitter a shingle join can meet) plus a
# ~2·√V-token rare tail that grows with the corpus (Heaps-like). Every
# 16th doc gets a near-dup twin (one appended out-of-vocab token,
# J = |A|/(|A|+1) ≥ 0.8), so τ=0.8 has guaranteed pairs to find.
# The query runs the PREFIX-FILTER tier — the scale path whose whole
# point is surviving that df≈n shingle (it sorts to the end of every
# document's (df, shingle) order and nearly never enters a prefix) —
# while the oracle recomputes the pair set with the quadratic
# all-postings formulation, affordable at oracle scale precisely
# because DuckDB pays the df² blowup only at sf0.01.
_ZIPF_MOD = 2147483647  # 2^31 - 1: keeps every intermediate in int64
_ZIPF_TWIN_EVERY = 16
_ZIPF_TAU = 0.8


def _zipf_token_sql(v: str) -> str:
    """Token at (doc_id, j) as an engine-neutral SQL scalar — pure
    BIGINT ops (%, *, +, integer ceil-div) that Spark SQL and DuckDB
    evaluate identically; ``v`` is the vocabulary-size expression."""
    h = (
        f"((((doc_id % {_ZIPF_MOD}) * 1000003 + j * 7919) % {_ZIPF_MOD})"
        f" * 48271) % {_ZIPF_MOD}"
    )
    x = f"(1 + ({h}) % {v})"
    # ceil(V/x) in exact integer arithmetic: (V + x - 1) div x
    return f"'w' || CAST((({v}) + {x} - 1) DIV {x} AS STRING)"


def zipf_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic heavy-tailed corpus (doc_id, text) both the
    registry query and its pytest differential run on."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    v = max(2, docs.count())  # scalar: a metadata-only parquet count
    tok = _zipf_token_sql(str(v))  # Spark SQL takes DIV/STRING as-is
    text = F.expr(
        "concat_ws(' ', transform(sequence(1, 8 + cast(pmod(doc_id, 7)"
        f" as int)), j -> {tok}))"
    )
    base = docs.select("doc_id", text.alias("text"))
    twins = base.where(F.col("doc_id") % _ZIPF_TWIN_EVERY == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
    )
    return base.unionByName(twins)


def q_dedup_zipf_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_prefix(
        zipf_corpus(spark, sf_dir), k=2, threshold=_ZIPF_TAU
    )


def q_skewed_doc_hotness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi JOIN (functions/skew.py::salted_join) under the
    oracle gate: the big side is the exploded token stream whose
    hottest key holds ~half of ALL rows — in a plain shuffle join that
    key funnels through one reducer; the salted form spreads it over 16
    at the cost of replicating the ~2·√V-row token dimension. The
    output (per-doc sum of global token document frequencies — a
    "hotness" score) equals the plain join's exactly, which is what
    the oracle states."""
    from optimal_parallel_fp_growth_spark.functions.skew import salted_join

    toks = zipf_corpus(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    dim = toks.groupBy("token").agg(F.count("*").alias("df"))
    joined = salted_join(toks, dim, on="token", salt_buckets=16)
    return joined.groupBy("doc_id").agg(
        F.sum("df").alias("df_sum"), F.count("*").alias("n_tokens")
    )


def q_skewed_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (functions/skew.py::salted_agg)
    under the oracle gate, on the corpus it exists for: the hottest
    token covers ~half of ALL positions, so a plain groupBy funnels
    ~half the exploded rows through ONE reducer — the salt spreads
    them over 16. Decomposable aggregates only (count/min/max), so the
    salted result is EXACTLY the plain GROUP BY the oracle states."""
    from optimal_parallel_fp_growth_spark.functions.skew import salted_agg

    toks = zipf_corpus(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return salted_agg(
        toks,
        ["token"],
        {"n": "count", "min_doc": "min:doc_id", "max_doc": "max:doc_id"},
        discriminator="doc_id",
        salt_buckets=16,
    )


# Shared by q_dedup_incremental and its oracle: docs with doc_id % 4 == 0
# play the "new batch", the rest the standing corpus.
INCREMENTAL_THRESHOLD = 0.25


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: build the corpus LSH index (two bucketed
    tables, the artifact a rolling corpus keeps between crawls), probe
    the new batch against it with zero index-side shuffle, then drop
    the session-temp index after materializing the result — same
    table-lifecycle hygiene as pagerank(bucketed_edges)."""
    import uuid

    from optimal_parallel_fp_growth_spark.functions.caching import (
        RddBlockHandle,
        persistent_rdd_ids,
        release_cached_inputs,
        tag_cached_inputs,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    name = f"opfpg_inc_{uuid.uuid4().hex}"
    dedup.build_minhash_index(corpus, name)
    out = dedup.dedup_against_index(
        batch, name, threshold=INCREMENTAL_THRESHOLD
    )
    seen = persistent_rdd_ids(spark)
    res = out.localCheckpoint()
    block_ids = persistent_rdd_ids(spark) - seen
    release_cached_inputs(out)  # the probe's signature cache
    dedup.drop_minhash_index(spark, name)
    return tag_cached_inputs(res, RddBlockHandle(spark, block_ids))


# Shared by q_versioned_read and its oracle: v1 = doc_id%3==0,
# v2 appends doc_id%3==1, v3 OVERWRITES with doc_id%3==2; the query
# time-travels to v2 with a pruning predicate. If time travel silently
# read the latest version the result would be the %3==2 rows and the
# oracle would mismatch; if manifest min/max pruning dropped a live
# file, rows would be missing.
VERSIONED_MIN_DOC_ID = 100


def q_versioned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full versioned-table lifecycle under the oracle gate
    (sources/versioned.py): create → append → overwrite → time-travel
    read of the pinned pre-overwrite version, with the manifest's
    per-file min/max stats pruning the doc_id predicate. Files are
    range-partitioned on doc_id at write so the ranges are disjoint
    and the prune actually skips files (pytest asserts the count via
    files_scanned). Session-temp table, dropped after materializing —
    same lifecycle hygiene as dedup_incremental/knn_ivf_index."""
    import os
    import shutil
    import tempfile
    import uuid

    from optimal_parallel_fp_growth_spark.functions.caching import (
        RddBlockHandle,
        persistent_rdd_ids,
        tag_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    tdir = tempfile.mkdtemp(prefix=f"opfpg_vt_{uuid.uuid4().hex}_")
    path = os.path.join(tdir, "tbl")
    try:
        by_range = lambda df: df.repartitionByRange(4, "doc_id")  # noqa: E731
        V.create_table(by_range(docs.where(F.col("doc_id") % 3 == 0)), path)
        V.append_table(by_range(docs.where(F.col("doc_id") % 3 == 1)), path)
        V.overwrite_table(by_range(docs.where(F.col("doc_id") % 3 == 2)), path)
        pinned = V.read_table(
            spark, path, version=2, prune=("doc_id", ">=", VERSIONED_MIN_DOC_ID)
        )
        out = pinned.groupBy("lang", "source").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        seen = persistent_rdd_ids(spark)
        res = out.localCheckpoint()
        block_ids = persistent_rdd_ids(spark) - seen
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return tag_cached_inputs(res, RddBlockHandle(spark, block_ids))


ORACLE_VERSIONED_READ = f"""
SELECT lang, source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents
WHERE doc_id % 3 < 2 AND doc_id >= {VERSIONED_MIN_DOC_ID}
GROUP BY lang, source
"""


def q_versioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE under the oracle gate: create the table from
    documents (range-partitioned on doc_id so file ranges are
    disjoint), upsert a source that UPDATES every doc_id % 10 == 0 row
    (n_chars -> -1) and INSERTS shifted twins (doc_id + 10^9), then
    aggregate the merged table. The manifest's per-file key ranges
    mean only intersecting files rewrite; the oracle recomputes the
    post-merge row set relationally — a lost update, ghost insert, or
    double-applied row breaks equality."""
    import os
    import shutil
    import tempfile
    import uuid

    from optimal_parallel_fp_growth_spark.functions.caching import (
        RddBlockHandle,
        persistent_rdd_ids,
        tag_cached_inputs,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    tdir = tempfile.mkdtemp(prefix=f"opfpg_vm_{uuid.uuid4().hex}_")
    path = os.path.join(tdir, "tbl")
    try:
        V.create_table(docs.repartitionByRange(4, "doc_id"), path)
        updates = docs.where(F.col("doc_id") % 10 == 0).select(
            "doc_id", "lang", "source", F.lit(-1).cast("long").alias("n_chars")
        )
        inserts = docs.where(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            "lang",
            "source",
            "n_chars",
        )
        V.merge_table(updates.unionByName(inserts), path, "doc_id")
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum((F.col("doc_id") >= 1_000_000_000).cast("long")).alias(
                "n_inserted"
            ),
        )
        seen = persistent_rdd_ids(spark)
        res = out.localCheckpoint()
        block_ids = persistent_rdd_ids(spark) - seen
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return tag_cached_inputs(res, RddBlockHandle(spark, block_ids))


# CDF delete cut shared by the Spark entry and its oracle.
VERSIONED_CDF_DELETE_BELOW = 50


def q_versioned_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-to-version CHANGE FEED under the oracle gate (round 11;
    sources/versioned.py::table_changes — the Delta CDF shape computed
    from the manifest diff, so only files exclusive to one side are
    read): create the table from documents (v1), COW-merge updates
    (doc_id % 10 == 0 → n_chars = -1) plus shifted-twin inserts
    (doc_id % 10 == 5, +10^9) giving v2, row-level delete of
    doc_id < 50 giving v3, then emit the COMPOSITE v1→v3 feed. The
    oracle restates every op in closed form — a key deleted after
    being updated must surface as a `delete` carrying its V1 pre-image
    (not the v2 one), ghost updates of content-identical survivor rows
    must NOT surface, and inserts/deletes must be exact."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    with session_temp_layout(spark, "cdf") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(docs.repartitionByRange(4, "doc_id"), path)
        updates = docs.where(F.col("doc_id") % 10 == 0).select(
            "doc_id", "lang", "source",
            F.lit(-1).cast("long").alias("n_chars"),
        )
        inserts = docs.where(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            "lang", "source", "n_chars",
        )
        V.merge_table(updates.unionByName(inserts), path, "doc_id")
        V.delete_where(
            spark, path, ("doc_id", "<", VERSIONED_CDF_DELETE_BELOW)
        )
        out = V.table_changes(spark, path, 1, 3, "doc_id").select(
            "_change_type", "doc_id", "n_chars"
        )
        return materialize(out)


ORACLE_VERSIONED_CHANGES = f"""
SELECT 'delete' AS _change_type, doc_id, n_chars
FROM documents WHERE doc_id < {VERSIONED_CDF_DELETE_BELOW}
UNION ALL
SELECT 'update_preimage', doc_id, n_chars
FROM documents
WHERE doc_id % 10 = 0 AND doc_id >= {VERSIONED_CDF_DELETE_BELOW}
UNION ALL
SELECT 'update_postimage', doc_id, CAST(-1 AS BIGINT)
FROM documents
WHERE doc_id % 10 = 0 AND doc_id >= {VERSIONED_CDF_DELETE_BELOW}
UNION ALL
SELECT 'insert', doc_id + 1000000000, n_chars
FROM documents WHERE doc_id % 10 = 5
"""


def q_clustered_table_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recorded clustering spec under the oracle gate (round 12;
    sources/versioned.py::create_table(cluster_by)): create the table
    CLUSTERED on doc_id from a deliberately hash-partitioned input,
    run a scattered COW merge WITHOUT any cluster option (the recorded
    spec must re-cluster the rewrite), then read the top key quintile
    through manifest-stat pruning. The in-query check fails closed
    unless the pruned read scans FEWER files than the table holds —
    i.e. the spec really survived a rewrite that touched every file.
    The oracle restates the merge and the quintile cut in closed
    form."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    cut = docs.agg((F.max("doc_id") * 4).cast("long")).collect()[0][0] // 5
    with session_temp_layout(spark, "clus") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(docs.repartition(8), path, cluster_by=["doc_id"])
        V.merge_table(
            docs.where(F.col("doc_id") % 10 == 0).select(
                "doc_id", "lang", F.lit(-5).cast("long").alias("n_chars")
            ),
            path, "doc_id",
        )
        total = V.files_scanned(path)
        scanned = V.files_scanned(path, prune=("doc_id", ">=", cut))
        if not (total >= 4 and scanned < total):
            raise AssertionError(
                f"pruned read scans {scanned}/{total} files - the recorded "
                "clustering spec did not survive the merge rewrite"
            )
        out = V.read_table(
            spark, path, prune=("doc_id", ">=", cut)
        ).where(F.col("doc_id") >= cut).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_CLUSTERED_TABLE_READ = """
SELECT lang, count(*) AS n_docs,
       sum(CASE WHEN doc_id % 10 = 0 THEN -5 ELSE n_chars END)::BIGINT
         AS total_chars
FROM documents
WHERE doc_id >= (SELECT (max(doc_id) * 4) // 5 FROM documents)
GROUP BY lang
"""


def q_versioned_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write UPDATE under the oracle gate (round 13;
    sources/versioned.py::update_where — completes the DML matrix
    next to merge / COW+MOR delete / restore / clone): create the
    table CLUSTERED on doc_id, UPDATE the first key quintile
    (n_chars -> n_chars * 10, source -> 'edited'), and aggregate the
    result. The in-query check fails closed unless the rewrite
    carried at least one file FORWARD BY REFERENCE — i.e. the
    manifest ranges really pruned the copy-on-write to the
    intersecting files, the property that makes a ranged UPDATE at
    100 TB cost one file rewrite instead of a table rewrite. The
    oracle restates the update as a CASE expression."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    cut = docs.agg(F.max("doc_id")).collect()[0][0] // 5
    with session_temp_layout(spark, "upd") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(docs.repartition(8), path, cluster_by=["doc_id"])
        before = set(V._load_manifest(path, 1)["files"])
        V.update_where(
            spark, path, ("doc_id", "<", cut),
            {"n_chars": F.col("n_chars") * 10, "source": F.lit("edited")},
        )
        after = set(V._load_manifest(path, 2)["files"])
        if not (len(before) >= 4 and before & after):
            raise AssertionError(
                f"update rewrote {len(before - after)}/{len(before)} files "
                "- manifest ranges did not prune the copy-on-write"
            )
        out = V.read_table(spark, path).groupBy("lang", "source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_VERSIONED_UPDATE = """
SELECT lang,
       CASE WHEN doc_id < (SELECT max(doc_id) // 5 FROM documents)
            THEN 'edited' ELSE source END AS source,
       count(*) AS n_docs,
       sum(CASE WHEN doc_id < (SELECT max(doc_id) // 5 FROM documents)
                THEN n_chars * 10 ELSE n_chars END)::BIGINT AS total_chars
FROM documents
GROUP BY 1, 2
"""


def q_stats_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate pushdown to manifest metadata under the oracle gate
    (round 13; sources/versioned.py::table_rowcount + table_minmax):
    COUNT(*) / MIN / MAX answered from the manifest's footer rowcounts
    and per-file ranges with ZERO data I/O — the Iceberg
    record_count / lower-upper bounds shape; at 100 TB these should
    cost one manifest read, not a scan. The lifecycle appends a
    second batch so the answer must fold stats across versions'
    files, and both helpers FAIL CLOSED (delete masks, missing
    stats) rather than guess — the oracle recomputes all five
    aggregates relationally."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    with session_temp_layout(spark, "sts") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(
            docs.where(F.col("doc_id") % 2 == 0).repartitionByRange(
                4, "doc_id"
            ),
            path,
        )
        V.append_table(
            docs.where(F.col("doc_id") % 2 == 1).repartitionByRange(
                2, "doc_id"
            ),
            path,
        )
        n = V.table_rowcount(path)
        id_lo, id_hi = V.table_minmax(path, "doc_id")
        ch_lo, ch_hi = V.table_minmax(path, "n_chars")
        out = spark.createDataFrame(
            [(n, id_lo, id_hi, ch_lo, ch_hi)],
            "n_rows long, min_doc long, max_doc long, "
            "min_chars long, max_chars long",
        )
        return materialize(out)


ORACLE_STATS_PUSHDOWN = """
SELECT count(*) AS n_rows,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents
"""


def q_versioned_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-predicate manifest pruning under the oracle gate (round
    13; read_table(prune=[...]) with AND semantics): read the MIDDLE
    doc_id quintile of a clustered table as
    [(doc_id >= lo), (doc_id < hi)]. The in-query check fails closed
    unless the conjunction scans FEWER files than EITHER single-sided
    predicate — the property the single-triple API could not express
    (one side of a range always scanned to an end of the table). The
    oracle restates the slice in closed form."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    top = docs.agg(F.max("doc_id")).collect()[0][0]
    lo, hi = (top * 2) // 5, (top * 3) // 5
    with session_temp_layout(spark, "rng") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(docs.repartition(8), path, cluster_by=["doc_id"])
        preds = [("doc_id", ">=", lo), ("doc_id", "<", hi)]
        both = V.files_scanned(path, prune=preds)
        left = V.files_scanned(path, prune=preds[0])
        right = V.files_scanned(path, prune=preds[1])
        if not (0 < both < min(left, right)):
            raise AssertionError(
                f"range prune scanned {both} files vs {left}/{right} "
                "single-sided - the conjunction did not cut both sides"
            )
        out = V.read_table(spark, path, prune=preds).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_VERSIONED_RANGE_READ = """
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents
WHERE doc_id >= (SELECT max(doc_id) * 2 // 5 FROM documents)
  AND doc_id <  (SELECT max(doc_id) * 3 // 5 FROM documents)
GROUP BY lang
"""


def q_merge_update_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-column MERGE under the oracle gate (round 13; the Delta
    whenMatchedUpdate(set=...) arm): the changeset updates ONLY
    n_chars — its lang column carries a poison value that must be
    IGNORED (kept from the table), and it includes shifted unmatched
    keys that must NOT insert (update-only semantics). The oracle
    restates the partial update as a CASE on the key class; one
    resurrected poison value, lost update, or ghost insert breaks
    equality."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    with session_temp_layout(spark, "muc") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(docs.repartitionByRange(4, "doc_id"), path)
        src = docs.where(F.col("doc_id") % 10 == 0).select(
            "doc_id",
            F.lit("POISON").alias("lang"),  # must be ignored
            F.lit(-9).cast("long").alias("n_chars"),
        )
        ghosts = docs.where(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            F.lit("POISON").alias("lang"),
            F.lit(0).cast("long").alias("n_chars"),
        )
        V.merge_table(
            src.unionByName(ghosts), path, "doc_id",
            update_cols=["n_chars"],
        )
        out = V.read_table(spark, path).groupBy("lang", "source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_MERGE_UPDATE_COLS = """
SELECT lang, source, count(*) AS n_docs,
       sum(CASE WHEN doc_id % 10 = 0 THEN -9 ELSE n_chars END)::BIGINT
         AS total_chars
FROM documents
GROUP BY lang, source
"""


def q_zorder_table_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order as a recorded cluster kind under the oracle gate (round
    13; create_table(cluster_kind="zorder") + multi-predicate prune):
    create the table Morton-interleaved on (doc_id, n_chars), COW-merge
    a scattered update with NO cluster option (the recorded kind must
    re-interleave the rewrite), then read a 2-D box. The in-query
    check fails closed unless the SECONDARY dimension's predicate
    alone prunes files (n_chars scans < total — structurally
    impossible under linear doc_id range clustering) and the
    conjunction prunes at least as hard as either side. The oracle
    restates the merge and the box in closed form."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    b = docs.agg(
        F.max("doc_id"), F.min("n_chars"), F.max("n_chars")
    ).collect()[0]
    id_lo, id_hi = (b[0] * 2) // 5, (b[0] * 3) // 5
    ch_hi = (b[1] + b[2]) // 2
    with session_temp_layout(spark, "zvt") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(
            docs.repartition(16), path,
            cluster_by=["doc_id", "n_chars"], cluster_kind="zorder",
        )
        V.merge_table(
            docs.where(F.col("doc_id") % 10 == 0).select(
                "doc_id", "lang", (F.col("n_chars") + 1).alias("n_chars")
            ),
            path, "doc_id",
        )
        box = [
            ("doc_id", ">=", id_lo), ("doc_id", "<", id_hi),
            ("n_chars", "<", ch_hi),
        ]
        total = V.files_scanned(path)
        za = V.files_scanned(path, prune=box[:2])
        zb = V.files_scanned(path, prune=[box[2]])
        zbox = V.files_scanned(path, prune=box)
        if not (total >= 8 and zb < total and zbox <= min(za, zb)):
            raise AssertionError(
                f"z-order pruning failed: box {zbox} / id {za} / chars "
                f"{zb} of {total} files - the recorded interleave did "
                "not survive the merge rewrite"
            )
        out = V.read_table(spark, path, prune=box).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_ZORDER_TABLE_READ = """
WITH merged AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 1 ELSE n_chars END
           AS n_chars
  FROM documents
), cuts AS (
  SELECT max(doc_id) * 2 // 5 AS id_lo, max(doc_id) * 3 // 5 AS id_hi,
         (min(n_chars) + max(n_chars)) // 2 AS ch_hi
  FROM documents
)
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM merged, cuts
WHERE doc_id >= id_lo AND doc_id < id_hi AND n_chars < ch_hi
GROUP BY lang
"""


def q_bucketed_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucketed layout under the oracle gate (round 13;
    create_table(bucket_by=...) — the Iceberg bucket transform): key
    the documents by md5(doc_id) so keys are UUID-shaPED and range
    stats are USELESS (every file spans the whole lexicographic
    range), bucket into 8, MERGE a 3-key changeset, and read back.
    Fails closed in-query unless (a) the merge carried all but ≤3
    files forward by reference — bucket-identity file selection, the
    pruning that survives hash-distributed keys — and (b) a point
    lookup on the bucket key opens exactly ONE file. The oracle
    restates the update relationally on doc_id."""
    import hashlib
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        "doc_id", "lang", "n_chars",
    )
    with session_temp_layout(spark, "bkt") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(docs.repartition(8), path, bucket_by=("h", 8))
        before = set(V._load_manifest(path, 1)["files"])
        upd = docs.where(F.col("doc_id") < 3).select(
            "h", "doc_id", "lang", F.lit(-3).cast("long").alias("n_chars")
        )
        V.merge_table(upd, path, "h")
        after = set(V._load_manifest(path, 2)["files"])
        probe = hashlib.md5(b"5").hexdigest()
        opened = V.files_scanned(path, prune=("h", "==", probe))
        if not (
            len(before) >= 5
            and len(before - after) <= 3
            and opened == 1
        ):
            raise AssertionError(
                f"bucket layout failed: merge rewrote "
                f"{len(before - after)}/{len(before)} files, point lookup "
                f"opened {opened} - bucket identity did not prune"
            )
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_BUCKETED_TABLE_MERGE = """
SELECT lang, count(*) AS n_docs,
       sum(CASE WHEN doc_id < 3 THEN -3 ELSE n_chars END)::BIGINT
         AS total_chars
FROM documents
GROUP BY lang
"""


def q_bucketed_sorted_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket transform COMPOSED with a sort order under the oracle
    gate (round 14, VERDICT r13 task #6; create_table(bucket_by=...,
    sort_within_buckets=..., bucket_file_rows=...) — Iceberg's bucket
    partition transform + write sort order): bucket the documents by
    their real ``source`` key into 4, sort each bucket on ``doc_id``
    and split into 40-row slices, so every file carries BOTH a bucket
    identity and a NARROW doc_id range. The two-predicate lookup
    (source equality + doc_id range) then opens exactly ONE file:
    bucket identity eliminates the other buckets, range stats
    eliminate the matching bucket's sibling slices — the composition
    neither layout gives alone. Fails closed in-query unless
    opened(two-pred) == 1 < opened(bucket-only) < opened(all). The
    oracle restates the lookup relationally."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    with session_temp_layout(spark, "sbkt") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(
            docs,
            path,
            bucket_by=("source", 4),
            sort_within_buckets=["doc_id"],
            bucket_file_rows=40,
        )
        total = V.files_scanned(path)
        bucket_only = V.files_scanned(path, prune=("source", "==", "src3"))
        preds = [
            ("source", "==", "src3"),
            ("doc_id", ">=", 100),
            ("doc_id", "<", 150),
        ]
        both = V.files_scanned(path, prune=preds)
        if not (both == 1 < bucket_only < total):
            raise AssertionError(
                f"sorted-bucket pruning failed: two-predicate lookup "
                f"opened {both}, bucket-only {bucket_only}, table "
                f"{total} - the composition did not prune"
            )
        out = V.read_table(spark, path, prune=preds).select(
            "doc_id", "lang", "n_chars"
        )
        return materialize(out)


ORACLE_BUCKETED_SORTED_READ = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE source = 'src3' AND doc_id >= 100 AND doc_id < 150
"""


def q_heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters by sketch-then-verify under the oracle gate
    (round 14; operators/sketches.py::heavy_hitters), on the corpus
    the shape exists for — the deterministic ZIPF token stream whose
    hottest token holds ~44% of all positions (the real documents
    fixture is deliberately flat: max bigram share ~0.2%, so no
    bounded-candidate sketch could gate a non-empty answer there).
    Phase 1 is ``freqItems`` (single-pass lossy counting, ≤ 1/support
    candidates whatever the corpus size — no false negatives); phase 2
    counts ONLY the candidates exactly and applies the true ceil(θ·n)
    cut, so the result equals the full groupBy-HAVING the oracle
    states while the shuffle carries candidates only. θ = 5%: the
    heavy set is the Zipf head (w1..w4, share 1/(k(k+1))), non-empty
    at every SF. Fails closed in-query unless the sketch actually
    pruned (candidates < distinct tokens) and the candidate list
    respects its 1/support bound."""
    from optimal_parallel_fp_growth_spark.operators.sketches import (
        heavy_hitters,
    )

    toks = zipf_corpus(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    heavy, n_cand, total = heavy_hitters(toks, "token", threshold=0.05)
    n_distinct = toks.distinct().count()
    if not (0 < n_cand <= 1 / 0.025 and n_cand < n_distinct):
        raise AssertionError(
            f"heavy-hitter sketch did not prune: {n_cand} candidates vs "
            f"{n_distinct} distinct tokens"
        )
    out = heavy.collect()
    if not out:
        raise AssertionError("Zipf head empty - the gate lost its teeth")
    return heavy


# ORACLE_HEAVY_HITTERS_TOKENS is defined after _zipf_corpus_cte below
# (module execution order).


def q_purge_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOR-mask materialization under the oracle gate (round 14;
    sources/versioned.py::purge_deletes — Iceberg's
    rewrite-position-deletes): create a range-clustered documents
    table, MOR-delete doc_id % 50 == 7 (one sidecar, zero data files
    touched), then PURGE. Fails closed in-query unless (a) the purge
    rewrote ONLY the stats-intersecting files (every out-of-range file
    carried by reference), (b) the purged manifest carries no
    sidecars, and (c) ``table_minmax`` — which fails closed while
    masks exist — answers from pure metadata afterwards with the true
    post-delete extremes. The oracle restates the delete
    relationally."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with session_temp_layout(spark, "purge") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(
            docs.repartitionByRange(4, "doc_id"), path, cluster_by=["doc_id"]
        )
        dels = docs.where(F.col("doc_id") % 50 == 7).select("doc_id")
        V.delete_rows(spark, path, dels, "doc_id")
        before = set(V._load_manifest(path, 2)["files"])
        v = V.purge_deletes(spark, path)
        man = V._load_manifest(path, v)
        carried = before & set(man["files"])
        # every quartile holds a doc_id % 50 == 7, so all four files
        # intersect — the gate is the exactness of the arithmetic:
        # carried + rewritten == before, sidecars gone, metadata back
        lo, hi = V.table_minmax(path, "doc_id")
        # the gate recomputes the post-delete extremes from the DATA
        # (distribution-independent — ids need not be contiguous), so
        # the metadata answer is checked against an independent scan
        want = docs.where(F.col("doc_id") % 50 != 7).agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).collect()[0]
        if man.get("delete_files") or (lo, hi) != (want.lo, want.hi):
            raise AssertionError(
                f"purge left sidecars or wrong metadata extremes "
                f"({lo}, {hi}) != ({want.lo}, {want.hi})"
            )
        if len(before - carried) > 4:
            raise AssertionError("purge rewrote more files than existed")
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
        )
        return materialize(out)


ORACLE_PURGE_DELETES = """
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       min(doc_id) AS min_doc
FROM documents
WHERE doc_id % 50 <> 7
GROUP BY lang
"""


def q_partial_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial compaction under the oracle gate (round 14;
    compact_table(where=...) — the Delta OPTIMIZE ... WHERE shape):
    build the documents table as FIVE single-file appends (doc_id
    quintiles — the small-file tail a streaming ingest leaves), then
    compact ONLY the first two quintiles. Fails closed in-query unless
    the three out-of-range files carried by reference AND the file
    count shrank — the hot-tail fold that never touches the cold data.
    The oracle is the identity aggregate (compaction moves bytes,
    never rows)."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    # quintile boundaries from the DATA (exact quantiles), so the five
    # single-file appends are non-empty and range-disjoint whatever the
    # id distribution — contiguous ids are a fixture accident, not a
    # contract
    qs = docs.stat.approxQuantile(
        "doc_id", [0.2, 0.4, 0.6, 0.8], 0.0
    )
    bounds = [float("-inf"), *qs, float("inf")]
    with session_temp_layout(spark, "pcomp") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        for i in range(5):
            sl = docs.where(
                (F.col("doc_id") > bounds[i])
                & (F.col("doc_id") <= bounds[i + 1])
            ).coalesce(1)
            if i == 0:
                V.create_table(sl, path)
            else:
                V.append_table(sl, path)
        before = set(V._load_manifest(path, 5)["files"])
        v = V.compact_table(
            spark, path, where=("doc_id", "<=", qs[1])
        )
        man = V._load_manifest(path, v)
        carried = before & set(man["files"])
        if not (len(carried) == 3 and len(man["files"]) < len(before)):
            raise AssertionError(
                f"partial compact carried {len(carried)}/{len(before)} "
                f"files into {len(man['files'])} - the fold touched "
                "out-of-range data or did not fold"
            )
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_PARTIAL_COMPACT = """
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents
GROUP BY lang
"""


def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only schema evolution under the oracle gate (round 14;
    sources/versioned.py::rename_column/add_column — the Delta/Iceberg
    ALTER TABLE tier): create the first half of the documents table,
    RENAME n_chars → chars and ADD a quality column (two commits that
    move ZERO data files — asserted on the manifests), then append the
    second half under the evolved schema. The read must reconcile both
    eras: pre-rename files serve `chars` through the manifest rename
    chain's alias coalesce, and serve `quality` as typed NULL. Fails
    closed in-query unless (a) both DDL commits carried the file list
    IDENTICALLY (metadata-only), and (b) `table_minmax` answers the
    renamed column from pure manifest stats across BOTH eras (the
    stats re-key). The oracle restates the era split with CASE."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    n = docs.count()
    half = n // 2
    lo, hi = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    ).collect()[0]
    with session_temp_layout(spark, "sevo") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(
            docs.where(F.col("doc_id") < half).repartitionByRange(
                2, "doc_id"
            ),
            path,
        )
        V.rename_column(path, "n_chars", "chars")
        V.add_column(path, "quality", "double")
        f1 = V._load_manifest(path, 1)["files"]
        f2 = V._load_manifest(path, 2)["files"]
        f3 = V._load_manifest(path, 3)["files"]
        V.append_table(
            docs.where(F.col("doc_id") >= half).select(
                "doc_id",
                "lang",
                F.col("n_chars").alias("chars"),
                (F.col("n_chars") % 7).cast("double").alias("quality"),
            ),
            path,
        )
        mm = V.table_minmax(path, "chars")
        if not (f1 == f2 == f3 and mm == (lo, hi)):
            raise AssertionError(
                f"schema DDL moved data (files {len(f1)}/{len(f2)}/"
                f"{len(f3)}) or stats re-key broke (minmax {mm} != "
                f"({lo}, {hi}))"
            )
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chars").alias("total_chars"),
            F.count("quality").alias("n_quality"),
            F.round(F.sum("quality"), 6).alias("sum_quality"),
        )
        return materialize(out)


ORACLE_SCHEMA_EVOLUTION_READ = """
WITH half AS (SELECT count(*) // 2 AS h FROM documents)
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       count(CASE WHEN doc_id >= h THEN 1 END) AS n_quality,
       round(sum(CASE WHEN doc_id >= h
                      THEN (n_chars % 7)::DOUBLE END), 6) AS sum_quality
FROM documents, half
GROUP BY lang
"""


def q_versioned_stream_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDF follow under the oracle gate (round 12, VERDICT
    r11 task #5; sources/versioned.py::stream_changes_to_table):
    build a five-commit lifecycle — create (v1), COW merge updating
    doc_id % 10 == 0 to n_chars = -5 (v2), MOR row-delete of
    doc_id % 7 == 3 (v3), RESTORE to v2 (v4: the sidecar is removed,
    the deleted rows must reappear through the feed), row-delete of
    doc_id < 50 (v5) — and FOLLOW it into a replica table one
    micro-batch per commit through the checkpointed cursor. The
    aggregate reads the REPLICA, so one dropped/duplicated/missed
    change row breaks equality with the closed-form oracle of the
    final base state."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with session_temp_layout(spark, "follow") as (tdir, materialize):
        base = os.path.join(tdir, "base")
        dst = os.path.join(tdir, "replica")
        ckpt = os.path.join(tdir, "ckpt")
        V.create_table(docs.repartitionByRange(4, "doc_id"), base)
        V.merge_table(
            docs.where(F.col("doc_id") % 10 == 0).select(
                "doc_id", "lang", F.lit(-5).cast("long").alias("n_chars")
            ),
            base, "doc_id",
        )
        V.delete_rows(
            spark, base,
            docs.where(F.col("doc_id") % 7 == 3).select("doc_id"),
            "doc_id",
        )
        V.restore_table(base, 2)
        V.delete_rows(
            spark, base,
            docs.where(
                F.col("doc_id") < VERSIONED_CDF_DELETE_BELOW
            ).select("doc_id"),
            "doc_id",
        )
        n = V.stream_changes_to_table(spark, base, dst, "doc_id", ckpt)
        if n != 5:
            raise AssertionError(
                f"expected one micro-batch per commit (5), applied {n}"
            )
        out = V.read_table(spark, dst).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_VERSIONED_STREAM_FOLLOW = f"""
SELECT lang, count(*) AS n_docs,
       sum(CASE WHEN doc_id % 10 = 0 THEN -5 ELSE n_chars END)::BIGINT
         AS total_chars
FROM documents
WHERE doc_id >= {VERSIONED_CDF_DELETE_BELOW}
GROUP BY lang
"""


def q_versioned_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest under the oracle gate (round 15,
    VERDICT r14 task #2; sources/versioned.py::stream_ingest_to_table):
    feed the documents table through a REAL availableNow stream —
    three single-file micro-batches on doc_id thirds — into a fresh
    versioned table, one txn-stamped manifest version per batch, then
    prove exactly-once by re-delivering a DUPLICATED EPOCH (the
    at-least-once failure mode: batch committed, checkpoint lost
    before advancing) and requiring the head version, history length,
    and row count all unchanged. The aggregate reads the ingested
    table, so a duplicated batch that actually committed would double
    its rows and break equality with the closed-form oracle over the
    batch input."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with session_temp_layout(spark, "ingest") as (tdir, materialize):
        feed = os.path.join(tdir, "feed")
        hi = docs.agg(F.max("doc_id")).first()[0]
        cuts = [hi // 3, 2 * (hi // 3)]
        lo = None
        for cut in [*cuts, None]:
            part = docs
            if lo is not None:
                part = part.where(F.col("doc_id") > lo)
            if cut is not None:
                part = part.where(F.col("doc_id") <= cut)
            part.coalesce(1).write.mode("append").parquet(feed)
            lo = cut
        tbl = os.path.join(tdir, "tbl")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        V.stream_ingest_to_table(
            stream, tbl, os.path.join(tdir, "ckpt"), app_id="ingest"
        ).awaitTermination()
        ops = [h["op"] for h in V.table_history(tbl)]
        if ops != ["create", "append", "append"]:
            raise AssertionError(
                f"expected one version per micro-batch, got {ops}"
            )
        if V.last_txn_epoch(tbl, "ingest") != 2:
            raise AssertionError(
                "txn watermark did not record the last epoch"
            )
        n = V.table_rowcount(tbl)
        # the duplicated epoch: batch 2's exact payload, re-delivered
        # with its already-committed (app_id, epoch) stamp
        dup = docs.where(F.col("doc_id") > cuts[1])
        v = V.with_retry(
            lambda: V.append_table(dup, tbl, txn=("ingest", 2))
        )
        if v != 3 or len(V.table_history(tbl)) != 3:
            raise AssertionError(
                "duplicated epoch committed a version - exactly-once "
                "broken"
            )
        if V.table_rowcount(tbl) != n:
            raise AssertionError("duplicated epoch changed the row count")
        out = V.read_table(spark, tbl).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_VERSIONED_STREAM_INGEST = """
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents
GROUP BY lang
"""


def q_spec_evolved_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution under the oracle gate (round 15,
    VERDICT r14 task #7; sources/versioned.py::evolve_table_spec —
    the Iceberg spec-evolution shape): create the table bucketed
    doc_id%4-wise over the LOW half of documents, evolve the spec to
    8 buckets METADATA-ONLY (the commit must carry the same files),
    then append the HIGH half under the new spec. The in-query gates
    prove per-era pruning: an equality probe in the low half opens
    exactly ONE file (bucket identity under the OLD spec picks 1 of
    the era-0 files; every era-1 file range-prunes away), a probe in
    the high half opens exactly ONE file (bucket identity under the
    NEW spec; era-0 files range-prune), and each pruned read still
    finds its row. The aggregate reads the whole cross-era table with
    an era-marker column, so a row lost (or duplicated) across the
    boundary breaks equality with the oracle."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with session_temp_layout(spark, "specs") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        mid = docs.agg(F.max("doc_id")).first()[0] // 2
        V.create_table(
            docs.where(F.col("doc_id") <= mid), path,
            bucket_by=("doc_id", 4),
        )
        V.evolve_table_spec(path, bucket_by=("doc_id", 8))
        ops = [h["op"] for h in V.table_history(path)]
        if ops != ["create", "evolve-spec"]:
            raise AssertionError(f"unexpected history {ops}")
        vs = V._versions(path)
        m1, m2 = V._load_manifest(path, 1), V._load_manifest(path, 2)
        if m2["files"] != m1["files"]:
            raise AssertionError(
                "evolve-spec rewrote data - it must be metadata-only"
            )
        if m2.get("spec_id") != 1 or "0" not in m2.get("specs", {}):
            raise AssertionError("spec registry not recorded")
        V.append_table(docs.where(F.col("doc_id") > mid), path)
        head = V._load_manifest(path, V._versions(path)[-1])
        fstats = head["file_stats"]
        old_n = sum(1 for f in m1["files"] if "__spec" not in fstats[f])
        new_n = sum(
            1
            for f in head["files"]
            if fstats[f].get("__spec") == 1
        )
        if old_n < 2 or new_n < 2:
            raise AssertionError(
                f"expected stamped files in both eras, got {old_n}/{new_n}"
            )
        probe_old = (
            docs.where(F.col("doc_id") <= mid)
            .agg(F.max("doc_id")).first()[0]
        )
        probe_new = docs.agg(F.max("doc_id")).first()[0]
        for probe, era in ((probe_old, "old"), (probe_new, "new")):
            opened = V.files_scanned(path, prune=("doc_id", "==", probe))
            if opened != 1:
                raise AssertionError(
                    f"{era}-era probe {probe} opened {opened} files - "
                    "per-era bucket pruning did not bite"
                )
            found = (
                V.read_table(spark, path, prune=("doc_id", "==", probe))
                .where(F.col("doc_id") == probe)
                .count()
            )
            if found != 1:
                raise AssertionError(
                    f"{era}-era probe {probe} lost its row under pruning"
                )
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(
                F.when(F.col("doc_id") <= mid, 1).otherwise(0)
            ).alias("n_old_era"),
        )
        return materialize(out)


def q_bloom_table_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest Bloom file-skipping under the oracle gate (round 15;
    sources/versioned.py::create_table(bloom_cols=...)): documents
    keyed by a SCATTERED md5 key (every file's [min, max] h-range
    spans the whole hex space, so range stats prune nothing and no
    bucket layout exists) written with per-file bloom bitmaps; a
    3-key point lookup must open ≤ 4 of the files (bitmap
    non-membership, zero file opens to decide) while an absent key
    opens ZERO, and the pruned read still finds every probed row —
    the oracle restates the lookup by doc_id."""
    import hashlib
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        "lang",
        "n_chars",
    )
    with session_temp_layout(spark, "bloom") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        n = docs.count()
        # size the bitmap to the expected per-file distinct count —
        # the auto path (a frozen width saturates and forfeits
        # skipping as the corpus grows; the 10x gate check caught
        # exactly that)
        V.create_table(
            docs.repartitionByRange(8, "doc_id"), path,
            bloom_cols=["h"],
            bloom_bits=V.bloom_bits_for(n // 8),
        )
        hi = docs.agg(F.max("doc_id")).first()[0]
        probe_ids = [0, hi // 2, hi]
        probes = [
            hashlib.md5(str(i).encode()).hexdigest() for i in probe_ids
        ]
        total = V.files_scanned(path)
        opened = V.files_scanned(path, prune=("h", "in", probes))
        # distribution-independent gates (the 10x key-shifted replica
        # has no doc_id 0, so "every probe exists" cannot be assumed):
        # the bloom must cut the scan to at most one file per probe
        # (+1 fp allowance), an absent key must cut it to zero, and
        # the pruned read must equal the full-scan filter row-for-row
        if not (opened <= len(probe_ids) + 1 < total):
            raise AssertionError(
                f"bloom skipping failed: {len(probe_ids)}-key lookup "
                f"opened {opened} of {total} files"
            )
        if V.files_scanned(path, prune=("h", "==", "not-a-key")) != 0:
            raise AssertionError("absent key did not prune every file")
        pruned = (
            V.read_table(spark, path, prune=("h", "in", probes))
            .where(F.col("h").isin(probes))
            .count()
        )
        full = (
            V.read_table(spark, path).where(F.col("h").isin(probes)).count()
        )
        if pruned != full:
            raise AssertionError(
                f"bloom pruning lost rows: {pruned} != {full}"
            )
        out = (
            V.read_table(spark, path, prune=("h", "in", probes))
            .where(F.col("h").isin(probes))
            .select("doc_id", "lang", "n_chars")
        )
        return materialize(out)


ORACLE_BLOOM_TABLE_READ = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE doc_id IN (0, (SELECT max(doc_id) // 2 FROM documents),
                 (SELECT max(doc_id) FROM documents))
"""


ORACLE_SPEC_EVOLVED_READ = """
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       sum(CASE WHEN doc_id <= (SELECT max(doc_id) // 2 FROM documents)
                THEN 1 ELSE 0 END)::BIGINT AS n_old_era
FROM documents
GROUP BY lang
"""


# the date-key scatter mapping for versioned_date_bloom_read:
# day(doc_id) = epoch + (doc_id * P) % M days. P prime and coprime to
# M scatters consecutive ids across the full span; the mapping is a
# bijection for doc_id < M but NOT for arbitrary ids (the 10x replica
# key-shifts ids to ~9e9), so the oracle and every gate are stated in
# DAY-MEMBERSHIP terms — colliding documents appear on both sides
# identically. M spans ~5475 years (max year ~7445, inside both
# Spark's and DuckDB's date range).
_DATE_BLOOM_P = 1_000_003
_DATE_BLOOM_M = 2_000_000


def q_versioned_date_bloom_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Manifest Bloom file-skipping on a DATE key (round 17, VERDICT
    r16 task #4; sources/versioned.py::_BUCKETABLE_TYPES +
    canon_date_days): documents stamped with a synthetic SCATTERED
    date (bijective in doc_id, decorrelated from the doc_id file
    clustering so range stats prune nothing) written with per-file
    bloom bitmaps on the date column — the writer canonicalizes
    date32 values to epoch days and the probe side coerces
    ``datetime.date`` / ISO-string probes through the same integers.
    A 3-day point lookup must open at most one file per matching row
    (+1 fp allowance), a verified-absent in-range day opens ZERO, and
    the pruned read equals the full-scan filter row-for-row; the
    oracle restates the lookup in the same day-membership terms, so
    day collisions (possible on key-shifted replicas where ids exceed
    the mapping modulus) appear identically on both sides."""
    import datetime
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    epoch = datetime.date(1970, 1, 1)

    def day_of(doc_id: int) -> datetime.date:
        return epoch + datetime.timedelta(
            days=(doc_id * _DATE_BLOOM_P) % _DATE_BLOOM_M
        )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            ((F.col("doc_id") * _DATE_BLOOM_P) % _DATE_BLOOM_M).cast(
                "int"
            ),
        ).alias("day"),
        "lang",
        "n_chars",
    )
    with session_temp_layout(spark, "datebloom") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(
            docs.repartitionByRange(8, "doc_id"), path,
            bloom_cols=["day"],  # bits="auto": width from distincts
        )
        hi = docs.agg(F.max("doc_id")).first()[0]
        probe_ids = [0, hi // 2, hi]
        probes = sorted({day_of(i) for i in probe_ids})
        total = V.files_scanned(path)
        fullscan = V.read_table(spark, path).where(
            F.col("day").isin(probes)
        )
        row = (
            fullscan.select(F.input_file_name().alias("__f"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("__f").alias("nf"),
            )
            .first()
        )
        full, containing = int(row["n"]), int(row["nf"])
        opened = V.files_scanned(path, prune=("day", "in", probes))
        # collision-robust gate: the bloom must open at most the files
        # that truly CONTAIN a probed day (+1 fp allowance) — on
        # key-shifted replicas a probed day may legitimately hold
        # several documents across several (or even all) files, so
        # "must cut the scan" is only demanded when containment
        # leaves something to cut
        if not (opened <= containing + 1):
            raise AssertionError(
                f"date bloom skipping failed: probed days live in "
                f"{containing} files but the lookup opened {opened}"
            )
        if containing < total and opened >= total:
            raise AssertionError(
                f"date bloom cut nothing: {containing} containing "
                f"files of {total}, opened {opened}"
            )
        # an in-range day VERIFIED absent from the corpus opens zero
        # files (the bloom-specific gate: range stats alone keep it)
        absent = day_of(hi + 1)
        holders = docs.where(F.col("day") == F.lit(absent)).count()
        if holders == 0 and V.files_scanned(
            path, prune=("day", "==", absent)
        ) != 0:
            raise AssertionError("absent day did not prune every file")
        # ISO-string probes canonicalize through the same epoch days
        if V.files_scanned(
            path, prune=("day", "==", probes[0].isoformat())
        ) != V.files_scanned(path, prune=("day", "==", probes[0])):
            raise AssertionError("ISO-string probe diverged from date")
        pruned = (
            V.read_table(spark, path, prune=("day", "in", probes))
            .where(F.col("day").isin(probes))
            .count()
        )
        if pruned != full:
            raise AssertionError(
                f"date bloom pruning lost rows: {pruned} != {full}"
            )
        out = (
            V.read_table(spark, path, prune=("day", "in", probes))
            .where(F.col("day").isin(probes))
            .select("doc_id", "lang", "n_chars")
        )
        return materialize(out)


ORACLE_VERSIONED_DATE_BLOOM_READ = """
WITH m AS (SELECT max(doc_id) AS hi FROM documents),
probes AS (
  SELECT DISTINCT (x * 1000003) % 2000000 AS off
  FROM (
    SELECT unnest([0, (SELECT hi FROM m) // 2, (SELECT hi FROM m)]) AS x
  )
)
SELECT doc_id, lang, n_chars
FROM documents
WHERE (doc_id * 1000003) % 2000000 IN (SELECT off FROM probes)
"""


def q_versioned_txn_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once DML under the oracle gate (round 16, VERDICT r15
    task #3; sources/versioned.py::delete_where/update_where/
    compact_table txn=): the streaming ``(app_id, epoch)`` watermark
    that already guards append/create/merge now guards the whole DML
    matrix — a stream-driven GDPR delete, correction update, or
    maintenance compaction whose micro-batch replays (committed, then
    checkpoint lost) must be a ZERO-IO no-op. The entry runs each
    writer once, then REPLAYS its epoch with a predicate that would
    mutate MORE rows if it executed: version history, rowcount and
    the final aggregate must be those of the first delivery only.
    The aggregate reads the table after delete+update, so a replay
    that actually committed breaks equality with the closed-form
    oracle over documents."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with session_temp_layout(spark, "txndml") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        hi = docs.agg(F.max("doc_id")).first()[0]
        lo_cut, hi_cut = hi // 10, 9 * (hi // 10)
        V.create_table(docs.repartitionByRange(4, "doc_id"), path)
        # epoch 1: ranged delete; replay widens the range — must no-op
        v = V.delete_where(
            spark, path, ("doc_id", "<", lo_cut), txn=("dml", 1)
        )
        n_after = V.read_table(spark, path).count()
        v_replay = V.delete_where(
            spark, path, ("doc_id", "<", 2 * lo_cut), txn=("dml", 1)
        )
        if v_replay != v or V.read_table(spark, path).count() != n_after:
            raise AssertionError(
                "replayed delete epoch committed - exactly-once broken"
            )
        # epoch 2: correction update; replay widens — must no-op
        v = V.update_where(
            spark, path, ("doc_id", ">=", hi_cut),
            {"n_chars": F.lit(-1).cast("bigint")},
            txn=("dml", 2),
        )
        flagged = V.read_table(spark, path).where("n_chars = -1").count()
        v_replay = V.update_where(
            spark, path, ("doc_id", ">=", lo_cut),
            {"n_chars": F.lit(-1).cast("bigint")},
            txn=("dml", 2),
        )
        if (
            v_replay != v
            or V.read_table(spark, path).where("n_chars = -1").count()
            != flagged
        ):
            raise AssertionError(
                "replayed update epoch committed - exactly-once broken"
            )
        # epoch 3: maintenance compaction; replay must add no version
        v = V.compact_table(spark, path, txn=("dml", 3))
        if V.compact_table(spark, path, txn=("dml", 3)) != v:
            raise AssertionError(
                "replayed compaction committed - exactly-once broken"
            )
        if V._versions(path) != [1, 2, 3, 4]:
            raise AssertionError(
                f"expected exactly 4 versions, got {V._versions(path)}"
            )
        if V.last_txn_epoch(path, "dml") != 3:
            raise AssertionError("txn watermark did not advance to 3")
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_VERSIONED_TXN_DML = """
WITH cuts AS (
  SELECT max(doc_id) // 10 AS lo_cut,
         9 * (max(doc_id) // 10) AS hi_cut
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       sum(CASE WHEN doc_id >= (SELECT hi_cut FROM cuts)
                THEN -1 ELSE n_chars END)::BIGINT AS total_chars
FROM documents
WHERE doc_id >= (SELECT lo_cut FROM cuts)
GROUP BY lang
"""


def q_bloom_evolved_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-sized manifest blooms added MID-LIFE via spec evolution
    (round 16, VERDICT r15 task #4; sources/versioned.py::
    evolve_table_spec(bloom_cols=..., bloom_bits="auto")): the low
    half of documents commits with NO bloom spec, the table evolves
    to bloom the scattered md5 key with "auto" width (each file's
    bitmap sized from its OWN distinct count — no caller-side
    arithmetic, the frozen-width-saturation fix), and the high half
    appends under the new spec. In-query gates prove era-correct
    skipping: an ABSENT key opens exactly the pre-bloom files (they
    fail OPEN — no bitmap ever says "definitely not here" for them)
    and ZERO post-evolution files; a present high-half key opens at
    most the pre-bloom files + 1 (+1 fp allowance); the pruned read
    equals the full-scan filter row-for-row. The final lookup
    re-reads through the prune, so a lost row breaks the oracle."""
    import hashlib
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        "lang",
        "n_chars",
    )
    with session_temp_layout(spark, "bloomauto") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        hi = docs.agg(F.max("doc_id")).first()[0]
        mid = hi // 2
        V.create_table(
            docs.where(F.col("doc_id") <= mid)
            .repartitionByRange(4, "doc_id"),
            path,
        )
        n_old = V.files_scanned(path)
        V.evolve_table_spec(path, bloom_cols=["h"])  # bits="auto"
        V.append_table(
            docs.where(F.col("doc_id") > mid)
            .repartitionByRange(4, "doc_id"),
            path,
        )
        total = V.files_scanned(path)
        if not n_old < total:
            raise AssertionError("append added no files")
        man = V._load_manifest(path, V._versions(path)[-1])
        widths = {
            st["__bloom"]["h"]["m"]
            for st in man["file_stats"].values()
            if "__bloom" in st
        }
        if not widths:
            raise AssertionError("no auto-sized bitmaps were stamped")
        # absent key: every bitmap-carrying file skips (±1 bloom
        # false positive, fpp ≈0.8%/file), every pre-bloom file
        # whose h-RANGE contains the probe fail-opens. The expected
        # open count is computed from the manifest rather than
        # assumed equal to n_old (review r16): at tiny scale factors
        # a pre-bloom file's [min, max] can exclude the digest and
        # range stats prune it — correct behavior the old exact
        # equality would have flagged. The probe is hex-shaped so it
        # lands inside most files' h-range at all.
        absent = hashlib.md5(b"absent-key").hexdigest()
        stats = man["file_stats"]
        expected = 0
        for f in man["files"]:
            st = stats.get(f) or {}
            if "__bloom" in st:
                continue
            rng = st.get("h")
            if not rng or (rng[0] <= absent <= rng[1]):
                expected += 1
        opened = V.files_scanned(path, prune=("h", "==", absent))
        if not expected <= opened <= expected + 1:
            raise AssertionError(
                f"absent key opened {opened} files, want the "
                f"{expected} range-surviving pre-bloom (fail-open) "
                "files (+1 fp allowance)"
            )
        if opened >= total:
            raise AssertionError(
                "absent key opened every file - bitmaps skipped nothing"
            )
        probe = hashlib.md5(str(hi).encode()).hexdigest()
        opened = V.files_scanned(path, prune=("h", "==", probe))
        if not opened <= n_old + 1:
            raise AssertionError(
                f"high-half probe opened {opened} files - auto bloom "
                "did not skip"
            )
        pruned = (
            V.read_table(spark, path, prune=("h", "==", probe))
            .where(F.col("h") == probe)
            .count()
        )
        if pruned != 1:
            raise AssertionError("bloom pruning lost the probed row")
        out = (
            V.read_table(spark, path, prune=("h", "==", probe))
            .where(F.col("h") == probe)
            .select("doc_id", "lang", "n_chars")
        )
        return materialize(out)


ORACLE_BLOOM_EVOLVED_READ = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE doc_id = (SELECT max(doc_id) FROM documents)
"""


def q_replace_where_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic slice replacement under the oracle gate (round 16;
    sources/versioned.py::overwrite_where — the Delta ``replaceWhere``
    backfill shape): documents committed in 4 range files, then the
    middle [25%, 75%) doc_id slice is REPLACED in ONE commit by a
    recomputed batch (same rows, n_chars negated) — no window where
    the slice is missing, unlike delete_where + append_table's two
    versions. The cuts sit at 37.5%/62.5% of the key space, safely
    INSIDE the 4-way range partitioning: cuts at the quartile
    boundaries themselves made the carried-file gate depend on range
    sampling jitter (flaky at sf0.1 — an edge file sometimes
    intersected the slice by a handful of rows). In-query gates: the history is exactly
    [create, replace_where]; at least one out-of-slice file carries
    BY REFERENCE into the new manifest (slice-bounded cost — at
    100 TB a backfill rewrites the slice, not the table); a
    replacement batch containing an out-of-slice row raises BEFORE
    anything commits and leaves the table untouched (the fail-closed
    containment contract); and a replayed ``txn`` epoch is a ZERO-IO
    no-op. The aggregate reads the final table, so a lost carried
    row, a surviving old slice row, or a leaked/doubled replacement
    breaks equality with the closed-form oracle."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with session_temp_layout(spark, "replwhere") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        hi = docs.agg(F.max("doc_id")).first()[0]
        lo_cut, hi_cut = 3 * (hi // 8), 5 * (hi // 8)
        V.create_table(docs.repartitionByRange(4, "doc_id"), path)
        man1 = V._load_manifest(path, 1)
        in_slice = (F.col("doc_id") >= lo_cut) & (F.col("doc_id") < hi_cut)
        repl = docs.where(in_slice).withColumn(
            "n_chars", -F.col("n_chars")
        )
        pred = [("doc_id", ">=", lo_cut), ("doc_id", "<", hi_cut)]
        V.overwrite_where(repl, path, pred, txn=("backfill", 1))
        ops = [h["op"] for h in V.table_history(path)]
        if ops != ["create", "replace_where"]:
            raise AssertionError(f"expected one atomic commit, got {ops}")
        man2 = V._load_manifest(path, 2)
        if not set(man1["files"]) & set(man2["files"]):
            raise AssertionError(
                "no out-of-slice file carried by reference - the "
                "backfill rewrote the whole table"
            )
        # fail-closed containment: a leaked row must abort pre-commit
        leak = docs.limit(1).withColumn(
            "doc_id", F.lit(hi + 10_000_000).cast("long")
        )
        try:
            V.overwrite_where(repl.unionByName(leak), path, pred)
        except ValueError:
            pass
        else:
            raise AssertionError(
                "out-of-slice replacement row did not fail closed"
            )
        # replayed epoch: a ZERO-IO no-op
        v = V.overwrite_where(
            docs.where(in_slice), path, pred, txn=("backfill", 1)
        )
        if v != 2 or V._versions(path) != [1, 2]:
            raise AssertionError(
                "replayed backfill epoch committed - exactly-once broken"
            )
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_REPLACE_WHERE_READ = """
WITH cuts AS (
  SELECT 3 * (max(doc_id) // 8) AS lo_cut,
         5 * (max(doc_id) // 8) AS hi_cut
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       sum(CASE WHEN doc_id >= (SELECT lo_cut FROM cuts)
                 AND doc_id < (SELECT hi_cut FROM cuts)
                THEN -n_chars ELSE n_chars END)::BIGINT AS total_chars
FROM documents
GROUP BY lang
"""


ORACLE_VERSIONED_MERGE = """
WITH merged AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 = 0 THEN -1 ELSE n_chars END AS n_chars,
         0 AS inserted
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, lang, n_chars, 1 AS inserted
  FROM documents WHERE doc_id % 10 = 5
)
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       sum(inserted)::BIGINT AS n_inserted
FROM merged GROUP BY lang
"""


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance under the oracle
    gate (round 11; sources/versioned.py::refresh_aggregate): build the
    (lang, source) count+sum rollup STATE at v1, drive the same
    lifecycle as `versioned_changes` (COW merge of updates+inserts →
    v2, row-level delete → v3), and roll the state forward TWICE
    through the change feed — v1→v2 then v2→v3, exercising chaining —
    without ever rescanning the table after v1. The oracle recomputes
    the v3 rollup directly from the closed-form final row set, so a
    mis-signed delta, a dropped-group leak, or a double-applied
    update-pair breaks equality."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    grp, sums, cnt = ["lang", "source"], [("n_chars", "total_chars")], "n_docs"
    with session_temp_layout(spark, "imv") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(docs.repartitionByRange(4, "doc_id"), path)
        state = V.aggregate_state(docs, grp, sums, cnt)
        updates = docs.where(F.col("doc_id") % 10 == 0).select(
            "doc_id", "lang", "source",
            F.lit(-1).cast("long").alias("n_chars"),
        )
        inserts = docs.where(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            "lang", "source", "n_chars",
        )
        V.merge_table(updates.unionByName(inserts), path, "doc_id")
        state = V.refresh_aggregate(
            spark, path, 1, 2, "doc_id", grp, sums, state=state, count_col=cnt
        )
        V.delete_where(
            spark, path, ("doc_id", "<", VERSIONED_CDF_DELETE_BELOW)
        )
        state = V.refresh_aggregate(
            spark, path, 2, 3, "doc_id", grp, sums, state=state, count_col=cnt
        )
        return materialize(V.present_aggregate(state, sums, cnt))


ORACLE_INCREMENTAL_AGG = f"""
WITH final AS (
  SELECT lang, source,
         CASE WHEN doc_id % 10 = 0 THEN -1 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id >= {VERSIONED_CDF_DELETE_BELOW}
  UNION ALL
  SELECT lang, source, n_chars FROM documents WHERE doc_id % 10 = 5
)
SELECT lang, source, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM final GROUP BY lang, source
"""


def q_materialized_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view lifecycle under the oracle gate (round 11;
    sources/versioned.py::create_view/sync_view/read_view): materialize
    the per-source (count, sum n_chars, sum doc_id) rollup of a
    versioned documents table at v1, advance the base through an
    APPEND (doc_id%7==3 twins shifted +2*10^9) and a row-level DELETE
    (doc_id < 100), then ONE composite sync catches the view up
    reading only CDF-exclusive files, and read_view presents the
    state read back from parquet (companion counts round-tripping
    through persistence). The oracle recomputes the final rollup from
    the closed-form row set."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    sums = [("n_chars", "total_chars"), ("doc_id", "id_sum")]
    with session_temp_layout(spark, "mview") as (tdir, materialize):
        base = os.path.join(tdir, "base")
        view = os.path.join(tdir, "view")
        V.create_table(docs.repartitionByRange(4, "doc_id"), base)
        V.create_view(spark, base, view, "doc_id", ["source"], sums, "n_docs")
        V.append_table(
            docs.where(F.col("doc_id") % 7 == 3).select(
                (F.col("doc_id") + 2_000_000_000).alias("doc_id"),
                "source", "n_chars",
            ),
            base,
        )
        V.delete_where(spark, base, ("doc_id", "<", 100))
        V.sync_view(spark, view)
        return materialize(V.read_view(spark, view))


ORACLE_MATERIALIZED_VIEW = """
WITH final AS (
  SELECT source, doc_id, n_chars FROM documents WHERE doc_id >= 100
  UNION ALL
  SELECT source, doc_id + 2000000000 AS doc_id, n_chars
  FROM documents WHERE doc_id % 7 = 3
)
SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       sum(doc_id)::BIGINT AS id_sum
FROM final GROUP BY source
"""


def q_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained inverted index under the oracle gate
    (round 11; sources/text_index.py): build the postings table at
    base v1, rewrite every doc_id % 10 == 0 document's TEXT to the
    single token 'zzz_upd' and insert +10^9 twins of doc_id % 10 == 5
    (one COW merge → v2), row-delete doc_id < 50 (→ v3), then ONE
    sync applies the posting delta — vanished (doc, token) pairs as
    merge deletes, new pairs as inserts, shared tokens cancelled —
    and the result is aggregated FROM THE INDEX (per-token df +
    doc_id checksum, so one wrong posting breaks equality). The
    oracle re-tokenizes the closed-form final corpus directly."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import text_index as TI
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    with session_temp_layout(spark, "tidx") as (tdir, materialize):
        base = os.path.join(tdir, "base")
        idx = os.path.join(tdir, "idx")
        V.create_table(docs.repartitionByRange(4, "doc_id"), base)
        TI.create_text_index(spark, base, idx)
        updates = docs.where(F.col("doc_id") % 10 == 0).select(
            "doc_id", F.lit("zzz_upd").alias("text")
        )
        inserts = docs.where(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        )
        V.merge_table(updates.unionByName(inserts), base, "doc_id")
        V.delete_where(
            spark, base, ("doc_id", "<", VERSIONED_CDF_DELETE_BELOW)
        )
        TI.sync_text_index(spark, idx)
        out = (
            V.read_table(spark, idx)
            .groupBy("token")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.sum("doc_id").alias("doc_sum"),
            )
        )
        return materialize(out)


ORACLE_INCREMENTAL_INDEX = f"""
WITH final AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN 'zzz_upd' ELSE text END AS text
  FROM documents WHERE doc_id >= {VERSIONED_CDF_DELETE_BELOW}
  UNION ALL
  SELECT doc_id + 1000000000, text FROM documents WHERE doc_id % 10 = 5
),
p AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM final
  )
)
SELECT token, count(*) AS df, sum(doc_id)::BIGINT AS doc_sum
FROM p GROUP BY token
"""


INDEX_SEARCH_TERMS = ("batch", "dup", "vector", "zzz_upd")


def q_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned term lookup through the maintained index (round 12,
    VERDICT r11 task #4; sources/text_index.py::search_text_index):
    build the postings table, churn the base — rewrite every
    doc_id % 10 == 0 document to the single token 'zzz_upd' (COW
    merge) and MOR-delete doc_id < 50 (postings spanning the whole
    vocabulary) — sync ONCE, then look up each term. The in-query
    check fails closed unless every lookup's manifest-stat prune
    scans FEWER files than the index holds — i.e. the sync's
    cluster-preserving merge really kept the token ranges disjoint.
    The oracle re-tokenizes the closed-form final corpus and filters
    to the same terms."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import text_index as TI
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    with session_temp_layout(spark, "tsearch") as (tdir, materialize):
        base = os.path.join(tdir, "base")
        idx = os.path.join(tdir, "idx")
        V.create_table(docs.repartitionByRange(4, "doc_id"), base)
        TI.create_text_index(spark, base, idx)
        V.merge_table(
            docs.where(F.col("doc_id") % 10 == 0).select(
                "doc_id", F.lit("zzz_upd").alias("text")
            ),
            base, "doc_id",
        )
        V.delete_rows(
            spark, base,
            docs.where(
                F.col("doc_id") < VERSIONED_CDF_DELETE_BELOW
            ).select("doc_id"),
            "doc_id",
        )
        TI.sync_text_index(spark, idx)
        total = V.files_scanned(idx)
        for term in INDEX_SEARCH_TERMS:
            scanned = V.files_scanned(idx, prune=("token", "==", term))
            if not scanned < total:
                raise AssertionError(
                    f"term lookup {term!r} scans {scanned}/{total} index "
                    "files - the clustered layout stopped pruning"
                )
        # the scale-shaped lookup: ONE scan over the union of the
        # terms' covering files (per-term pruning asserted above is
        # driver-side manifest math — no extra reads)
        hits = TI.search_text_index_terms(
            spark, idx, list(INDEX_SEARCH_TERMS)
        )
        out = hits.select(
            F.col("token").alias("term"), "doc_id"
        ).groupBy("term").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("doc_id").alias("doc_sum"),
        )
        return materialize(out)


ORACLE_INDEX_SEARCH = f"""
WITH final AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN 'zzz_upd' ELSE text END AS text
  FROM documents WHERE doc_id >= {VERSIONED_CDF_DELETE_BELOW}
),
p AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM final
  )
)
SELECT token AS term, count(*) AS df, sum(doc_id)::BIGINT AS doc_sum
FROM p WHERE token IN ('batch', 'dup', 'vector', 'zzz_upd')
GROUP BY token
"""


def q_mor_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read equality deletes under the oracle gate (round 11;
    sources/versioned.py::delete_rows): create the table, MOR-delete
    every doc_id % 7 == 3 key — the in-query check fails closed if the
    commit rewrote ANY data file, the whole point of merge-on-read —
    then COW-upsert the doc_id % 14 == 3 half of the deleted class
    back (n_chars = -5), proving the sequence rule: re-inserted rows
    outlive the older sidecar while the other half stays masked. The
    aggregate reads through the masks; the oracle states the final
    visible set in closed form."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources import versioned as V

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with session_temp_layout(spark, "mor") as (tdir, materialize):
        path = os.path.join(tdir, "tbl")
        V.create_table(docs.repartitionByRange(4, "doc_id"), path)
        V.delete_rows(
            spark, path,
            docs.where(F.col("doc_id") % 7 == 3).select("doc_id"),
            "doc_id",
        )
        if V._load_manifest(path, 2)["files"] != V._load_manifest(path, 1)["files"]:
            raise AssertionError("merge-on-read delete rewrote data files")
        V.merge_table(
            docs.where(F.col("doc_id") % 14 == 3).select(
                "doc_id", "lang", F.lit(-5).cast("long").alias("n_chars")
            ),
            path, "doc_id",
        )
        out = V.read_table(spark, path).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        return materialize(out)


ORACLE_MOR_DELETE_READ = """
SELECT lang, count(*) AS n_docs,
       sum(CASE WHEN doc_id % 14 = 3 THEN -5 ELSE n_chars END)::BIGINT
         AS total_chars
FROM documents
WHERE doc_id % 7 <> 3 OR doc_id % 14 = 3
GROUP BY lang
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(load_table(spark, sf_dir, "documents"), max_hamming=6)


def q_deduped_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.deduped_corpus(
        load_table(spark, sf_dir, "documents"), threshold=0.2
    )


def q_deduped_corpus_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.deduped_corpus(
        load_table(spark, sf_dir, "documents"), threshold=0.2, policy="cc"
    )


def q_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_quantiles(load_table(spark, sf_dir, "documents"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_clusters(
        load_table(spark, sf_dir, "documents"), threshold=0.2
    )


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.corpus_split(
        load_table(spark, sf_dir, "documents"), SPLIT_WEIGHTS
    ).select("doc_id", "split")


def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.mix_sources(
        load_table(spark, sf_dir, "documents"), MIX_RATES
    ).select("doc_id", "source")


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngrams.ngram_counts(
        load_table(spark, sf_dir, "documents"), n=3, min_count=2
    )


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring signal (round 6): per doc,
    how many of its 6-token gram positions occur in >= 2 distinct
    documents — the distributed re-basing of substring-level dedup
    (suffix arrays → n-gram postings). The oracle recomputes the full
    postings pipeline in SQL."""
    return ngrams.repeated_spans(
        load_table(spark, sf_dir, "documents"), n=6, min_docs=2
    )


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup as a TRANSFORM (round 15;
    operators/ngrams.py::remove_repeated_spans): drop every token
    position covered by a 6-gram occurring in >= 2 distinct documents
    and re-join the survivors in order — the removal action of
    Lee et al. 2022 substring dedup, distributed via n-gram postings.
    The oracle rebuilds every cleaned text with string_agg over the
    surviving positions, so one mis-covered position or a reordered
    token breaks string-exact equality."""
    return ngrams.remove_repeated_spans(
        load_table(spark, sf_dir, "documents"), n=6, min_docs=2
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngrams.inverted_index(
        load_table(spark, sf_dir, "documents"), max_postings=10, min_df=2
    )


def q_source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngrams.source_ngram_overlap(load_table(spark, sf_dir, "documents"), n=3)


def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.mix_by_temperature(
        load_table(spark, sf_dir, "documents"), target_total=300, alpha=0.5
    ).select("doc_id", "source")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.stratified_sample(
        load_table(spark, sf_dir, "documents"), strata_col="source", n_per_stratum=10
    ).select("doc_id", "source")


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted sample: 10 docs per lang, inclusion probability
    ∝ n_chars (longer docs favored — the "sample by token budget"
    shape every mixture-weighting pipeline needs)."""
    return sampling.weighted_sample(
        load_table(spark, sf_dir, "documents"),
        weight_col="n_chars",
        n=10,
        by="lang",
    ).select("doc_id", "lang", "n_chars")


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from optimal_parallel_fp_growth_spark.plans.curate import curate_corpus

    return curate_corpus(
        load_table(spark, sf_dir, "documents"), split_weights=SPLIT_WEIGHTS
    )


# ---------------------------------------------------------------------------
# DuckDB oracles

_TOKS_CTE = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
"""

_STOPWORDS_SQL = _sql_list(EN_STOPWORDS)

_SHINGLES_CTE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(toks) >= 2
                   THEN list_distinct([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))])
                   ELSE [] END AS sh
       FROM t)
"""

ORACLE_TEXT_STATS = (
    _TOKS_CTE
    + f"""
SELECT doc_id,
       length(text) AS n_chars_obs,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_regex_tokens,
       round((length(text) - len(toks) + 1) / greatest(len(toks), 1), 6) AS avg_token_len,
       round(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x)))
             / greatest(len(toks), 1), 6) AS stopword_ratio,
       round(length(regexp_replace(text, '[^0-9]', '', 'g'))
             / greatest(length(text), 1), 6) AS digit_ratio
FROM t
"""
)

ORACLE_QUALITY_SCORE = (
    _TOKS_CTE
    + f"""
SELECT doc_id,
       round(0.4 * least(len(toks) / 50.0, 1.0)
             + 0.4 * (len(list_distinct(toks)) / greatest(len(toks), 1))
             + 0.2 * least((len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x)))
                            / greatest(len(toks), 1)) * 5.0, 1.0), 6) AS quality
FROM t
"""
)

_MARKER_VALUES = ",\n             ".join(
    f"('{lang}', {_sql_list(words)})" for lang, words in sorted(LANG_MARKERS.items())
)

ORACLE_LANG_ID = (
    _TOKS_CTE
    + f""",
hits AS (SELECT doc_id, m.lang,
                len(list_filter(toks, x -> list_contains(m.markers, x))) AS h
         FROM t CROSS JOIN (VALUES {_MARKER_VALUES}) AS m(lang, markers)),
best AS (SELECT doc_id, lang, h,
                row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang ASC) AS rn
         FROM hits)
SELECT doc_id, CASE WHEN h > 0 THEN lang ELSE 'und' END AS lang_pred
FROM best WHERE rn = 1
"""
)

ORACLE_DOC_FINGERPRINT = f"""
WITH n AS (SELECT doc_id,
                  md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS h,
                  list_transform(string_split(text, ' '),
                                 t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS th
           FROM documents)
SELECT doc_id, h AS fp_md5,
       ('0x' || substr(h, 1, 15))::BIGINT AS fp_int,
       list_reduce(list_prepend(0::BIGINT, th),
                   (acc, hh) -> (acc * {textops.ROLL_B} + hh) % {textops.ROLL_P}) AS fp_roll
FROM n
"""

ORACLE_DEDUP_EXACT = """
SELECT sha256(text) AS text_sha256, min(doc_id) AS doc_id_kept, count(*) AS n_dups
FROM documents GROUP BY 1
"""

# exact tier (max_df=0): every shingle joins, |A∩B| via posting count
ORACLE_NGRAM_JACCARD_EXACT = (
    _SHINGLES_CTE
    + """,
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM posting a JOIN posting b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.2
"""
)

# Zipf skew-stress oracle: the SAME integer-only generation as
# q_dedup_zipf_prefix (one shared token-expression builder), then the
# quadratic all-postings exact jaccard at τ=0.8 — affordable here
# precisely because only DuckDB at sf0.01 pays the heavy-hitter df²
# blowup the Spark prefix tier exists to avoid.
def _zipf_corpus_cte() -> str:
    """The generated-corpus CTE prefix shared by every Zipf oracle."""
    tok = _zipf_token_sql("nn.v").replace(" DIV ", " // ")
    return f"""
WITH nn AS (SELECT greatest(2, count(*)) AS v FROM documents),
base AS (SELECT doc_id,
                list_transform(range(1, 9 + (doc_id % 7)),
                               j -> {tok}) AS toks
         FROM documents CROSS JOIN nn),
corpus AS (SELECT doc_id, toks FROM base
           UNION ALL
           SELECT -doc_id - 1 AS doc_id, toks || ['zz9'] AS toks
           FROM base WHERE doc_id % {_ZIPF_TWIN_EVERY} = 0)"""


ORACLE_HEAVY_HITTERS_TOKENS = (
    _zipf_corpus_cte()
    + """,
tk AS (SELECT unnest(toks) AS token FROM corpus)
SELECT token, count(*) AS n
FROM tk
GROUP BY token
HAVING count(*) >= ceil(0.05 * (SELECT count(*) FROM tk))
"""
)


def _zipf_oracle_sql() -> str:
    return _zipf_corpus_cte() + f""",
sh AS (SELECT doc_id,
              CASE WHEN len(toks) >= 2
                   THEN list_distinct([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))])
                   ELSE [] END AS sh
       FROM corpus),
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM posting a JOIN posting b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM sh)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= {_ZIPF_TAU}
"""


ORACLE_ZIPF_PREFIX = _zipf_oracle_sql()

# salted_agg uses only decomposable aggregates, so the oracle is the
# plain GROUP BY — correctness of the two-phase spread IS the check.
ORACLE_SKEWED_TOKEN_COUNTS = (
    _zipf_corpus_cte()
    + """,
tk AS (SELECT doc_id, unnest(toks) AS token FROM corpus)
SELECT token, count(*) AS n,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM tk GROUP BY 1
"""
)

# salted_join output equals the plain equi join by construction, so the
# oracle is the plain join + rollup (sum cast ::BIGINT per the
# HUGEINT-hashability rule).
ORACLE_SKEWED_DOC_HOTNESS = (
    _zipf_corpus_cte()
    + """,
tk AS (SELECT doc_id, unnest(toks) AS token FROM corpus),
dfq AS (SELECT token, count(*) AS df FROM tk GROUP BY 1)
SELECT tk.doc_id, CAST(sum(dfq.df) AS BIGINT) AS df_sum,
       count(*) AS n_tokens
FROM tk JOIN dfq USING (token)
GROUP BY 1
"""
)

# auto-max_df default: candidates must share a shingle with
# df <= ngram_max_df_for(n) = greatest(50, ceil(sqrt(n_docs))) — the
# scalar-subquery mirror of operators/dedup.py::ngram_max_df_for, and
# jaccard recomputed exactly over the full shingle sets (list_intersect
# on the surviving candidates), matching the Spark pruned tier.
_NGRAM_AUTO_MAX_DF = (
    "(SELECT greatest(50, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM documents)"
)

ORACLE_NGRAM_JACCARD = (
    _SHINGLES_CTE
    + f""",
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
df AS (SELECT shingle, count(*) AS df FROM posting GROUP BY 1),
rare AS (SELECT shingle FROM df WHERE df <= {_NGRAM_AUTO_MAX_DF}),
rp AS (SELECT p.doc_id, p.shingle FROM posting p JOIN rare USING (shingle)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM rp a JOIN rp b
           ON a.shingle = b.shingle AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       round(len(list_intersect(sa.sh, sb.sh))
             / len(list_distinct(sa.sh || sb.sh)), 6) AS jaccard
FROM cand
JOIN sh sa ON cand.doc_a = sa.doc_id
JOIN sh sb ON cand.doc_b = sb.doc_id
WHERE round(len(list_intersect(sa.sh, sb.sh))
            / len(list_distinct(sa.sh || sb.sh)), 6) >= 0.2
"""
)

_AB_VALUES = ",\n             ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(dedup.MINHASH_AB)
)

ORACLE_MINHASH_LSH = (
    _SHINGLES_CTE
    + f""",
nz AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
hs AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
       FROM (SELECT doc_id, unnest(sh) AS s FROM nz)),
mh AS (SELECT doc_id, seed, min((h * a + b) % {dedup.MINHASH_P}) AS mhv
       FROM hs CROSS JOIN (VALUES {_AB_VALUES}) ab(seed, a, b)
       GROUP BY 1, 2),
sig AS (SELECT doc_id, list(mhv ORDER BY seed) AS sig FROM mh GROUP BY 1),
bands AS (SELECT doc_id, b,
                 sig[b * {dedup.ROWS_PER_BAND} + 1 : b * {dedup.ROWS_PER_BAND} + {dedup.ROWS_PER_BAND}] AS band_sig
          FROM sig CROSS JOIN range({dedup.NUM_BANDS}) r(b)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.b = b.b AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       round(len(list_intersect(na.sh, nb.sh))
             / len(list_distinct(na.sh || nb.sh)), 6) AS jaccard
FROM cand
JOIN nz na ON cand.doc_a = na.doc_id
JOIN nz nb ON cand.doc_b = nb.doc_id
WHERE round(len(list_intersect(na.sh, nb.sh))
            / len(list_distinct(na.sh || nb.sh)), 6) >= 0.2
"""
)

# Incremental probe (q_dedup_incremental): same signature CTEs;
# candidates restricted to new-batch x corpus; similarity is the
# minhash-component agreement estimator (the signatures verify tier),
# exactly as Spark computes it.
ORACLE_DEDUP_INCREMENTAL = (
    _SHINGLES_CTE
    + f""",
nz AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
hs AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
       FROM (SELECT doc_id, unnest(sh) AS s FROM nz)),
mh AS (SELECT doc_id, seed, min((h * a + b) % {dedup.MINHASH_P}) AS mhv
       FROM hs CROSS JOIN (VALUES {_AB_VALUES}) ab(seed, a, b)
       GROUP BY 1, 2),
sig AS (SELECT doc_id, list(mhv ORDER BY seed) AS sig FROM mh GROUP BY 1),
bands AS (SELECT doc_id, b,
                 sig[b * {dedup.ROWS_PER_BAND} + 1 : b * {dedup.ROWS_PER_BAND} + {dedup.ROWS_PER_BAND}] AS band_sig
          FROM sig CROSS JOIN range({dedup.NUM_BANDS}) r(b)),
cand AS (SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS dup_of
         FROM bands n JOIN bands c
           ON n.b = c.b AND n.band_sig = c.band_sig
         WHERE n.doc_id % 4 = 0 AND c.doc_id % 4 != 0)
SELECT cand.doc_id, cand.dup_of,
       round(sum(CASE WHEN mn.mhv = mc.mhv THEN 1 ELSE 0 END)
             / {dedup.NUM_HASHES}.0, 6) AS jaccard_est
FROM cand
JOIN mh mn ON mn.doc_id = cand.doc_id
JOIN mh mc ON mc.doc_id = cand.dup_of AND mc.seed = mn.seed
GROUP BY 1, 2
HAVING round(sum(CASE WHEN mn.mhv = mc.mhv THEN 1 ELSE 0 END)
             / {dedup.NUM_HASHES}.0, 6) >= {INCREMENTAL_THRESHOLD}
"""
)


ORACLE_SIMHASH = f"""
WITH tok AS (SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
             FROM documents),
h AS (SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h_lo,
             ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_hi
      FROM tok),
votes AS (SELECT doc_id, i,
                 sum(CASE WHEN (CASE WHEN i < 32 THEN h_lo >> i::INT
                                     ELSE h_hi >> (i - 32)::INT END) & 1 = 1
                          THEN 1 ELSE -1 END) AS v
          FROM h CROSS JOIN range({dedup.SIMHASH_BITS}) r(i)
          GROUP BY 1, 2),
fp AS (SELECT doc_id,
              sum(CASE WHEN v <= 0 THEN 0
                       WHEN i = 63 THEN -9223372036854775808
                       ELSE (1::BIGINT << i::INT) END)::BIGINT AS fp
       FROM votes GROUP BY 1),
bands AS (SELECT doc_id, fp, b,
                 (fp >> (b * {dedup.SIMHASH_BAND_BITS})::INT)
                   & {(1 << dedup.SIMHASH_BAND_BITS) - 1} AS band_val
          FROM fp CROSS JOIN range({dedup.SIMHASH_BANDS}) r(b)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.fp AS fp_a, b.fp AS fp_b
         FROM bands a JOIN bands b
           ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, bit_count(xor(fp_a, fp_b)) AS hamming
FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 6
"""

ORACLE_DEDUPED_CORPUS = f"""
WITH keep_exact AS (SELECT min(doc_id) AS doc_id FROM documents
                    GROUP BY sha256(text)),
near_drop AS (SELECT DISTINCT doc_b FROM ({ORACLE_MINHASH_LSH}))
SELECT d.doc_id, d.lang, d.source
FROM documents d
JOIN keep_exact USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_b FROM near_drop)
"""

ORACLE_DEDUPED_CORPUS_CC = f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({ORACLE_MINHASH_LSH})),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
keep_exact AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
drop_cc AS (SELECT DISTINCT u AS doc_id FROM reach WHERE v < u)
SELECT d.doc_id, d.lang, d.source
FROM documents d
JOIN keep_exact USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM drop_cc)
"""

ORACLE_TOKEN_QUANTILES = """
SELECT lang, count(*) AS n_docs,
       round(quantile_cont(len(string_split(text, ' ')), 0.5), 6) AS p50,
       round(quantile_cont(len(string_split(text, ' ')), 0.9), 6) AS p90,
       round(quantile_cont(len(string_split(text, ' ')), 0.99), 6) AS p99
FROM documents GROUP BY lang
"""

ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({ORACLE_MINHASH_LSH})),
edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
minr AS (SELECT u, min(v) AS mv FROM reach GROUP BY u)
SELECT d.doc_id, least(d.doc_id, coalesce(minr.mv, d.doc_id)) AS cluster_id
FROM documents d LEFT JOIN minr ON minr.u = d.doc_id
"""


def _split_case_sql() -> str:
    clauses, cum = [], 0.0
    for name, w in SPLIT_WEIGHTS[:-1]:
        cum += w
        clauses.append(f"WHEN b < {int(round(cum * sampling.BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{SPLIT_WEIGHTS[-1][0]}' END"


ORACLE_CORPUS_SPLIT = f"""
WITH b AS (SELECT doc_id,
                  ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT
                  % {sampling.BUCKETS} AS b
           FROM documents)
SELECT doc_id, {_split_case_sql()} AS split FROM b
"""

_RATE_VALUES = ", ".join(
    f"('{s}', {int(round(r * sampling.BUCKETS))})"
    for s, r in sorted(MIX_RATES.items())
)

ORACLE_MIX_SOURCES = f"""
WITH rates(source, keep_below) AS (VALUES {_RATE_VALUES})
SELECT d.doc_id, d.source
FROM documents d LEFT JOIN rates r USING (source)
WHERE ('0x' || substr(md5('mix:' || d.doc_id::VARCHAR), 1, 8))::BIGINT
      % {sampling.BUCKETS} < coalesce(r.keep_below, {int(round(1.0 * sampling.BUCKETS))})
"""

ORACLE_REPETITION = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
ts AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
              max(c) AS top_tok
       FROM tc GROUP BY 1),
g AS (SELECT doc_id,
             unnest([toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))]) AS gram
      FROM t WHERE len(toks) >= 2),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
gs AS (SELECT doc_id, sum(c) AS n_grams, max(c) AS top_gram FROM gc GROUP BY 1)
SELECT ts.doc_id, n_tokens,
       round(n_distinct / n_tokens::DOUBLE, 6) AS distinct_ratio,
       round(top_tok / n_tokens::DOUBLE, 6) AS top_token_frac,
       round(coalesce(top_gram / n_grams::DOUBLE, 0.0), 6) AS top_2gram_frac
FROM ts LEFT JOIN gs ON ts.doc_id = gs.doc_id
"""

ORACLE_TFIDF = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (SELECT doc_id, tf.term, tf,
                  round(tf * ln((SELECT n_docs FROM n) / df::DOUBLE), 6) AS score
           FROM tf JOIN df ON tf.term = df.term),
ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term ASC) AS rank
           FROM scored)
SELECT doc_id, term, tf, score, rank::INT AS rank FROM ranked WHERE rank <= 5
"""

# chunk_tokens=16, overlap=4 -> stride 12; chunk i is toks[1+12i : 12i+16].
ORACLE_CHUNKS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, toks,
             unnest(range(0, (1 + ceil(greatest(len(toks) - 16, 0) / 12.0))::BIGINT)) AS chunk_idx
      FROM t)
SELECT doc_id, chunk_idx::INT AS chunk_idx,
       len(toks[(chunk_idx * 12 + 1)::INT:(chunk_idx * 12 + 16)::INT])::INT AS n_tokens,
       array_to_string(toks[(chunk_idx * 12 + 1)::INT:(chunk_idx * 12 + 16)::INT], ' ') AS chunk_text
FROM c
"""

ORACLE_PACKS = """
WITH counted AS (SELECT doc_id, source AS "group",
                        len(string_split(text, ' '))::INT AS n_tokens
                 FROM documents)
SELECT doc_id, "group", n_tokens,
       ((sum(n_tokens) OVER (PARTITION BY "group" ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens)
        // 256)::BIGINT AS pack_id
FROM counted
"""

from optimal_parallel_fp_growth_spark.operators.pii import PII_PATTERNS as _PII

ORACLE_PII_STATS = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII[0][1]}'))::INT AS n_email,
       len(regexp_extract_all(text, '{_PII[1][1]}'))::INT AS n_phone,
       len(regexp_extract_all(text, '{_PII[2][1]}'))::INT AS n_ip,
       (len(regexp_extract_all(text, '{_PII[0][1]}'))
        + len(regexp_extract_all(text, '{_PII[1][1]}'))
        + len(regexp_extract_all(text, '{_PII[2][1]}'))) > 0 AS has_pii
FROM documents
"""

ORACLE_DECONTAMINATE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh3 AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3
                    THEN list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                        FOR i IN range(1, len(toks) - 1)])
                    ELSE [] END AS sh
        FROM t),
tp AS (SELECT doc_id, unnest(sh) AS shingle FROM sh3),
ep AS (SELECT doc_id AS eval_id, unnest(sh) AS shingle FROM sh3 WHERE doc_id % 50 = 0)
SELECT doc_id, eval_id, count(*)::BIGINT AS n_shared
FROM tp JOIN ep USING (shingle)
WHERE doc_id <> eval_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""

# trigrams: valid 1-based starts are 1..len-2, range() is end-exclusive,
# greatest(...,1) makes short docs contribute an empty range.
ORACLE_GOPHER_RULES = (
    _TOKS_CTE
    + f"""
SELECT doc_id,
       len(toks) AS n_words,
       len(toks) >= 25 AND len(toks) <= 100000 AS pass_word_count,
       (length(text) - len(toks) + 1) / greatest(len(toks), 1) >= 3.0
         AND (length(text) - len(toks) + 1) / greatest(len(toks), 1) <= 10.0
         AS pass_word_len,
       len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
         / greatest(len(toks), 1) >= 0.8 AS pass_alpha,
       len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) >= 2
         AS pass_stopwords,
       len(list_distinct(toks)) / greatest(len(toks), 1) >= 0.3 AS pass_dup,
       (len(toks) >= 25 AND len(toks) <= 100000)
         AND ((length(text) - len(toks) + 1) / greatest(len(toks), 1) >= 3.0
              AND (length(text) - len(toks) + 1) / greatest(len(toks), 1) <= 10.0)
         AND (len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
              / greatest(len(toks), 1) >= 0.8)
         AND (len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) >= 2)
         AND (len(list_distinct(toks)) / greatest(len(toks), 1) >= 0.3) AS keep
FROM t
"""
)

ORACLE_BLOOM_DECONTAMINATE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh3 AS (SELECT doc_id,
               CASE WHEN len(toks) >= 3
                    THEN list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                        FOR i IN range(1, len(toks) - 1)])
                    ELSE [] END AS sh
        FROM t),
tp AS (SELECT doc_id, unnest(sh) AS shingle FROM sh3 WHERE doc_id % 50 <> 0),
ep AS (SELECT unnest(sh) AS shingle FROM sh3 WHERE doc_id % 50 = 0)
SELECT DISTINCT doc_id FROM tp WHERE shingle IN (SELECT shingle FROM ep)
"""

ORACLE_NGRAM_COUNTS = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
grams AS (SELECT array_to_string(t[i : i+2], ' ') AS gram
          FROM toks, UNNEST(range(1, greatest(len(t)-1, 1))) AS u(i))
SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY 1 HAVING COUNT(*) >= 2
"""

ORACLE_REPEATED_SPANS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (SELECT doc_id, greatest(len(t) - 5, 0) AS n_grams FROM toks),
pos AS (SELECT doc_id, array_to_string(t[i : i+5], ' ') AS gram
        FROM toks, UNNEST(range(1, greatest(len(t)-4, 1))) AS u(i)),
occ AS (SELECT doc_id, gram, count(*) AS occ FROM pos GROUP BY 1, 2),
rep AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
per_doc AS (SELECT doc_id, sum(occ) AS r
            FROM occ JOIN rep USING (gram) GROUP BY 1)
SELECT b.doc_id, b.n_grams,
       coalesce(r, 0)::BIGINT AS repeated_occ,
       round(CASE WHEN b.n_grams > 0 THEN coalesce(r, 0) / b.n_grams
                  ELSE 0.0 END, 6) AS repeat_frac
FROM base b LEFT JOIN per_doc USING (doc_id)
"""

ORACLE_INVERTED_INDEX = """
WITH pairs AS (SELECT DISTINCT doc_id,
                      unnest(list_distinct(string_split(text, ' '))) AS token
               FROM documents)
SELECT token, COUNT(*) AS df,
       array_to_string((list_sort(list(doc_id)))[1:10], '|') AS postings
FROM pairs GROUP BY token HAVING COUNT(*) >= 2
"""

ORACLE_DEDUP_SPANS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, u.i - 1 AS gi,
             array_to_string(toks[u.i:u.i+5], ' ') AS gram
      FROM t, LATERAL (SELECT UNNEST(range(1, len(toks) - 4)) AS i) u
      WHERE len(toks) >= 6),
rep AS (SELECT gram FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
cov AS (SELECT DISTINCT g.doc_id, g.gi + v.o AS pos
        FROM g JOIN rep USING (gram),
             LATERAL (SELECT UNNEST(range(6)) AS o) v),
p AS (SELECT doc_id, u.i - 1 AS pos, toks[u.i] AS tok
      FROM t, LATERAL (SELECT UNNEST(range(1, len(toks) + 1)) AS i) u),
kept AS (SELECT p.doc_id, p.pos, p.tok
         FROM p LEFT JOIN cov ON p.doc_id = cov.doc_id AND p.pos = cov.pos
         WHERE cov.pos IS NULL)
SELECT t.doc_id, len(t.toks)::INT AS n_tokens,
       (len(t.toks) - count(k.pos))::INT AS n_removed,
       coalesce(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text_clean
FROM t LEFT JOIN kept k USING (doc_id)
GROUP BY t.doc_id, len(t.toks)
"""

ORACLE_SOURCE_NGRAM_OVERLAP = """
WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
sg AS (SELECT DISTINCT source, array_to_string(t[i : i+2], ' ') AS gram
       FROM toks, UNNEST(range(1, greatest(len(t)-1, 1))) AS u(i))
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared_grams
FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""

# Same per-source rate math as sampling.mix_by_temperature (target 300,
# alpha 0.5, BUCKETS 10000, salt 'mixtemp').
ORACLE_MIX_TEMPERATURE = """
WITH c AS (SELECT source, COUNT(*) AS c_s FROM documents GROUP BY 1),
w AS (SELECT source, c_s, pow(c_s, 0.5) AS pw,
             SUM(pow(c_s, 0.5)) OVER () AS tot FROM c),
r AS (SELECT source,
             CAST(round(least(1.0, 300.0 * pw / tot / c_s) * 10000, 0) AS INT)
               AS keep_below
      FROM w)
SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
WHERE ('0x' || substr(md5('mixtemp:' || d.doc_id::VARCHAR), 1, 8))::BIGINT
      % 10000 < r.keep_below
"""

# End-to-end curation: existing oracle CTEs chained in the pipeline's
# stage order (dedup survivors ∩ quality ≥ 0.5 → train split → packing).
_TRAIN_BELOW = int(round(SPLIT_WEIGHTS[0][1] * sampling.BUCKETS))

ORACLE_CURATE_CORPUS = f"""
WITH surv AS (SELECT doc_id FROM ({ORACLE_DEDUPED_CORPUS})),
qual AS (SELECT * FROM ({ORACLE_QUALITY_SCORE})),
kept AS (SELECT d.doc_id, d.source, d.text FROM documents d
         JOIN surv USING (doc_id) JOIN qual USING (doc_id)
         WHERE quality >= 0.5),
tr AS (SELECT doc_id, source, text FROM kept
       WHERE ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::BIGINT
             % {sampling.BUCKETS} < {_TRAIN_BELOW}),
counted AS (SELECT doc_id, source,
                   len(string_split(text, ' '))::INT AS n_tokens FROM tr)
SELECT doc_id, source, n_tokens,
       ((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens)
        // 256)::BIGINT AS pack_id
FROM counted
"""

# Same A-ES key as sampling.weighted_sample (salt 'wsample'): u from the
# first 8 md5 hex digits, rank on round(ln(u)/w, 9) desc with id
# tiebreak — the rounded-key contract keeps both engines' orderings
# identical despite libm ulps.
ORACLE_WEIGHTED_SAMPLE = """
WITH k AS (SELECT doc_id, lang, n_chars,
                  round(ln((('0x' || substr(md5('wsample:' || doc_id::VARCHAR), 1, 8))::BIGINT + 1.0)
                           / 4294967296.0) / n_chars, 9) AS key
           FROM documents WHERE n_chars > 0),
r AS (SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rn
      FROM k)
SELECT doc_id, lang, n_chars FROM r WHERE rn <= 10
"""

# Same (md5, id) total order as sampling.stratified_sample (salt 'strat').
ORACLE_STRATIFIED_SAMPLE = """
WITH r AS (SELECT doc_id, source,
                  row_number() OVER (
                      PARTITION BY source
                      ORDER BY md5('strat:' || doc_id::VARCHAR), doc_id) AS rn
           FROM documents)
SELECT doc_id, source FROM r WHERE rn <= 10
"""

def q_dq_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over the corpus: every constraint is one
    aggregate expression in ONE single-pass agg job (see
    operators/quality_checks.py) — constraint count does not add scans."""
    from optimal_parallel_fp_growth_spark.operators.quality_checks import (
        documents_quality_suite,
    )

    return documents_quality_suite(load_table(spark, sf_dir, "documents"))


# Mirrors documents_quality_suite constraint-for-constraint (lock-step).
ORACLE_DQ_DOCUMENTS = """
WITH m AS (
  SELECT round(avg((text IS NOT NULL)::INT), 9)                      AS text_complete,
         round(count(DISTINCT doc_id)::DOUBLE / count(doc_id), 9)    AS doc_id_unique,
         round(avg((lang IN ('de','en','es','fr','zh'))::INT), 9)    AS lang_accepted,
         round(avg((n_chars = length(text))::INT), 9)                AS n_chars_consistent,
         round(avg((source IS NOT NULL)::INT), 9)                    AS source_complete,
         round(min(n_chars)::DOUBLE, 9)                              AS min_chars
  FROM documents)
SELECT u.check, u.observed,
       CASE u.check
         WHEN 'text_complete'      THEN u.observed = 1.0
         WHEN 'doc_id_unique'      THEN u.observed = 1.0
         WHEN 'lang_accepted'      THEN u.observed = 1.0
         WHEN 'n_chars_consistent' THEN u.observed >= 0.99
         WHEN 'source_complete'    THEN u.observed = 1.0
         ELSE u.observed >= 1.0
       END AS passed
FROM (
  SELECT 'text_complete' AS check, text_complete AS observed FROM m
  UNION ALL SELECT 'doc_id_unique', doc_id_unique FROM m
  UNION ALL SELECT 'lang_accepted', lang_accepted FROM m
  UNION ALL SELECT 'n_chars_consistent', n_chars_consistent FROM m
  UNION ALL SELECT 'source_complete', source_complete FROM m
  UNION ALL SELECT 'min_chars', min_chars FROM m) u
"""


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal with 16-token chunks standing in
    for paragraphs (the synthetic corpus has no newlines): chunk each
    document (stride 16, no overlap), drop every chunk that appears
    verbatim in ≥ 2 distinct documents, reassemble the survivors."""
    from optimal_parallel_fp_growth_spark.operators.linededup import (
        dedup_lines_from,
    )
    from optimal_parallel_fp_growth_spark.operators.packing import chunk_documents

    chunks = chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=16, overlap=0
    )
    return dedup_lines_from(
        chunks, sep="\n", pos_col="chunk_idx", line_col="chunk_text"
    )


# stride 16 = chunk_tokens (overlap 0); mirrors q_dedup_lines
# stage-for-stage: chunk, blacklist md5(chunk) in >= 2 distinct docs,
# anti-join, reassemble in chunk order.
ORACLE_DEDUP_LINES = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, toks,
             unnest(range(0, (1 + ceil(greatest(len(toks) - 16, 0) / 16.0))::BIGINT)) AS chunk_idx
      FROM t),
l AS (SELECT doc_id, chunk_idx AS pos,
             array_to_string(toks[(chunk_idx * 16 + 1)::INT:(chunk_idx * 16 + 16)::INT], ' ') AS line
      FROM c),
h AS (SELECT doc_id, pos, line, md5(line) AS lh FROM l),
bl AS (SELECT lh FROM (SELECT lh, count(DISTINCT doc_id) AS nd FROM h GROUP BY lh)
       WHERE nd >= 2),
kept AS (SELECT h.doc_id, h.pos, h.line FROM h
         LEFT JOIN bl ON h.lh = bl.lh WHERE bl.lh IS NULL),
re AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
              count(*) AS n_kept
       FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_lines FROM h GROUP BY doc_id)
SELECT tot.doc_id, coalesce(re.clean_text, '') AS clean_text, tot.n_lines,
       tot.n_lines - coalesce(re.n_kept, 0) AS n_removed
FROM tot LEFT JOIN re ON tot.doc_id = re.doc_id
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped hashed linear classifier over documents
    (operators/classifier.py) with the deterministic seed-weight
    stand-in table."""
    from optimal_parallel_fp_growth_spark.operators.classifier import (
        score_documents,
        seed_weights,
    )

    return score_documents(
        load_table(spark, sf_dir, "documents"), seed_weights(spark)
    )


ORACLE_QUALITY_CLASSIFIER = """
WITH w AS (SELECT b AS bucket,
                  ('0x' || substr(md5('w:' || b::VARCHAR), 1, 8))::BIGINT
                  % 2000001 - 1000000 AS weight_micro
           FROM range(1024) t(b)),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
f AS (SELECT doc_id,
             ('0x' || substr(md5('t:' || tok), 1, 8))::BIGINT % 1024 AS bucket
      FROM tok),
a AS (SELECT doc_id, count(*) AS n_tokens, sum(weight_micro)::BIGINT AS sw
      FROM f JOIN w USING (bucket) GROUP BY doc_id),
s AS (SELECT doc_id, n_tokens,
             round(1.0 / (1.0 + exp(-(0.0 + sw::DOUBLE / 1000000.0 / n_tokens))),
                   6) AS score
      FROM a)
SELECT doc_id, n_tokens, score, score >= 0.5 AS label FROM s
"""



def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL HTML main-content extraction (round 7): wrap each doc's
    text in a deterministic page — link-dense nav/sidebar/footer
    boilerplate around the lone escaped article paragraph, built
    entirely in JVM codegen — then run the stdlib-HTMLParser
    link-density extractor (operators/html.py). The oracle restates
    the template's block census in closed form: 5 text blocks, only
    the article paragraph survives the 0.33 link-density gate, its
    text is the original doc text, and the page-level link density is
    (37 + 2*len(str(doc_id))) / (52 + 2*len(str(doc_id)) + len(text))
    — any parser/gate bug shifts a count or the density and breaks
    equality."""
    from optimal_parallel_fp_growth_spark.operators.html import (
        attach_html,
        extract_main_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_main_text(attach_html(docs))


ORACLE_HTML_EXTRACT = """
SELECT doc_id,
       5::INT AS n_blocks,
       1::INT AS n_kept,
       text AS main_text,
       length(text)::INT AS n_chars,
       round((37.0 + 2 * length(doc_id::VARCHAR))
             / (52.0 + 2 * length(doc_id::VARCHAR) + length(text)),
             6) AS link_density
FROM documents
"""



def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter, self-scored (round 7; extraction
    rebuilt round 8): train the add-alpha bigram model on the documents
    corpus (operators/lm.py — pure Catalyst: IN-ROW zip_with of the
    token array with its own shifted tail, no lead() window and no
    doc_id exchange, then ONE map-side-combined count aggregation and a
    broadcast probability join; the count table is localCheckpoint-ed
    so train + score scan the corpus once each) and score every
    document's perplexity under it. The oracle restates the whole
    estimator in SQL — tokenize with positions, lead() bigrams (the
    oracle MAY shuffle; the engine must not), (c+α)/(c1+α·V)
    conditionals, per-doc mean NLL — so any drift in tokenization, the
    smoothing arithmetic, or the join fallbacks breaks equality."""
    from optimal_parallel_fp_growth_spark.operators.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    lm = train_bigram_lm(docs)
    return score_perplexity(docs, lm)


ORACLE_LM_PERPLEXITY = """
WITH toks AS (
  SELECT doc_id, u.i AS pos, string_split(text, ' ')[u.i] AS w1
  FROM documents,
       LATERAL (SELECT UNNEST(generate_series(1,
                  len(string_split(text, ' ')))) AS i) u
),
bigrams AS (
  SELECT doc_id, w1,
         lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
bg AS (
  SELECT w1, w2, count(*)::DOUBLE AS c
  FROM bigrams WHERE w2 IS NOT NULL GROUP BY 1, 2
),
ctx AS (SELECT w1, sum(c) AS c1 FROM bg GROUP BY 1),
v AS (
  SELECT count(DISTINCT t)::DOUBLE AS v FROM (
    SELECT w1 AS t FROM bigrams WHERE w2 IS NOT NULL
    UNION SELECT w2 FROM bigrams WHERE w2 IS NOT NULL
  )
),
probs AS (
  SELECT bg.w1, bg.w2, ln((bg.c + 0.5) / (ctx.c1 + 0.5 * v.v)) AS logp
  FROM bg, ctx, v WHERE bg.w1 = ctx.w1
)
SELECT b.doc_id,
       count(*)::INT AS n_bigrams,
       round(-avg(p.logp), 6) AS avg_nll,
       round(exp(-avg(p.logp)), 4) AS ppl
FROM bigrams b JOIN probs p ON b.w1 = p.w1 AND b.w2 = p.w2
WHERE b.w2 IS NOT NULL
GROUP BY b.doc_id
"""


DOC_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_lines": q_dedup_lines,
    "quality_classifier": q_quality_classifier,
    "text_stats": q_text_stats,
    "repetition_signals": q_repetition_signals,
    "tfidf_top_terms": q_tfidf_top_terms,
    "chunk_documents": q_chunk_documents,
    "pack_sequences": q_pack_sequences,
    "pii_stats": q_pii_stats,
    "decontaminate": q_decontaminate,
    "bloom_decontaminate": q_bloom_decontaminate,
    "gopher_rules": q_gopher_rules,
    "negative_pairs": q_negative_pairs,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_ngram_exact": q_dedup_ngram_exact,
    "dedup_ngram_prefix": q_dedup_ngram_prefix,
    "dedup_zipf_prefix": q_dedup_zipf_prefix,
    "skewed_token_counts": q_skewed_token_counts,
    "skewed_doc_hotness": q_skewed_doc_hotness,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_incremental": q_dedup_incremental,
    "dedup_simhash": q_dedup_simhash,
    "deduped_corpus": q_deduped_corpus,
    "token_quantiles": q_token_quantiles,
    "dedup_clusters": q_dedup_clusters,
    "deduped_corpus_cc": q_deduped_corpus_cc,
    "corpus_split": q_corpus_split,
    "mix_sources": q_mix_sources,
    "ngram_counts": q_ngram_counts,
    "repeated_spans": q_repeated_spans,
    "dedup_spans": q_dedup_spans,
    "inverted_index": q_inverted_index,
    "source_ngram_overlap": q_source_ngram_overlap,
    "mix_temperature": q_mix_temperature,
    "stratified_sample": q_stratified_sample,
    "weighted_sample": q_weighted_sample,
    "curate_corpus": q_curate_corpus,
    "dq_documents": q_dq_documents,
    "versioned_read": q_versioned_read,
    "versioned_merge": q_versioned_merge,
    "versioned_changes": q_versioned_changes,
    "incremental_agg": q_incremental_agg,
    "materialized_view": q_materialized_view,
    "incremental_index": q_incremental_index,
    "mor_delete_read": q_mor_delete_read,
    "index_search": q_index_search,
    "versioned_stream_follow": q_versioned_stream_follow,
    "versioned_stream_ingest": q_versioned_stream_ingest,
    "spec_evolved_read": q_spec_evolved_read,
    "bloom_table_read": q_bloom_table_read,
    "versioned_txn_dml": q_versioned_txn_dml,
    "bloom_evolved_read": q_bloom_evolved_read,
    "replace_where_read": q_replace_where_read,
    "versioned_date_bloom_read": q_versioned_date_bloom_read,
    "clustered_table_read": q_clustered_table_read,
    "versioned_update": q_versioned_update,
    "stats_pushdown": q_stats_pushdown,
    "versioned_range_read": q_versioned_range_read,
    "zorder_table_read": q_zorder_table_read,
    "pii_redact": q_pii_redact,
    "bucketed_table_merge": q_bucketed_table_merge,
    "normalize_text": q_normalize_text,
    "merge_update_cols": q_merge_update_cols,
    "bucketed_sorted_read": q_bucketed_sorted_read,
    "heavy_hitters_tokens": q_heavy_hitters_tokens,
    "purge_deletes": q_purge_deletes,
    "partial_compact": q_partial_compact,
    "schema_evolution_read": q_schema_evolution_read,
    "html_extract": q_html_extract,
    "lm_perplexity": q_lm_perplexity,
}

DOC_ORACLES: dict[str, str] = {
    "dedup_lines": ORACLE_DEDUP_LINES,
    "quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "deduped_corpus": ORACLE_DEDUPED_CORPUS,
    "text_stats": ORACLE_TEXT_STATS,
    "repetition_signals": ORACLE_REPETITION,
    "tfidf_top_terms": ORACLE_TFIDF,
    "chunk_documents": ORACLE_CHUNKS,
    "pack_sequences": ORACLE_PACKS,
    "pii_stats": ORACLE_PII_STATS,
    "decontaminate": ORACLE_DECONTAMINATE,
    "bloom_decontaminate": ORACLE_BLOOM_DECONTAMINATE,
    "gopher_rules": ORACLE_GOPHER_RULES,
    "negative_pairs": ORACLE_NEGATIVE_PAIRS,
    "quality_score": ORACLE_QUALITY_SCORE,
    "lang_id": ORACLE_LANG_ID,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "dedup_ngram_exact": ORACLE_NGRAM_JACCARD_EXACT,
    # identical contract by the prefix-filter theorem; high-τ cut
    "dedup_ngram_prefix": ORACLE_NGRAM_JACCARD_EXACT.replace(">= 0.2", ">= 0.8"),
    "dedup_zipf_prefix": ORACLE_ZIPF_PREFIX,
    "skewed_token_counts": ORACLE_SKEWED_TOKEN_COUNTS,
    "skewed_doc_hotness": ORACLE_SKEWED_DOC_HOTNESS,
    "dedup_minhash_lsh": ORACLE_MINHASH_LSH,
    "dedup_incremental": ORACLE_DEDUP_INCREMENTAL,
    "dedup_simhash": ORACLE_SIMHASH,
    "token_quantiles": ORACLE_TOKEN_QUANTILES,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "deduped_corpus_cc": ORACLE_DEDUPED_CORPUS_CC,
    "corpus_split": ORACLE_CORPUS_SPLIT,
    "mix_sources": ORACLE_MIX_SOURCES,
    "ngram_counts": ORACLE_NGRAM_COUNTS,
    "repeated_spans": ORACLE_REPEATED_SPANS,
    "dedup_spans": ORACLE_DEDUP_SPANS,
    "inverted_index": ORACLE_INVERTED_INDEX,
    "source_ngram_overlap": ORACLE_SOURCE_NGRAM_OVERLAP,
    "mix_temperature": ORACLE_MIX_TEMPERATURE,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "curate_corpus": ORACLE_CURATE_CORPUS,
    "dq_documents": ORACLE_DQ_DOCUMENTS,
    "versioned_read": ORACLE_VERSIONED_READ,
    "versioned_merge": ORACLE_VERSIONED_MERGE,
    "versioned_changes": ORACLE_VERSIONED_CHANGES,
    "incremental_agg": ORACLE_INCREMENTAL_AGG,
    "materialized_view": ORACLE_MATERIALIZED_VIEW,
    "incremental_index": ORACLE_INCREMENTAL_INDEX,
    "mor_delete_read": ORACLE_MOR_DELETE_READ,
    "index_search": ORACLE_INDEX_SEARCH,
    "versioned_stream_follow": ORACLE_VERSIONED_STREAM_FOLLOW,
    "versioned_stream_ingest": ORACLE_VERSIONED_STREAM_INGEST,
    "spec_evolved_read": ORACLE_SPEC_EVOLVED_READ,
    "bloom_table_read": ORACLE_BLOOM_TABLE_READ,
    "versioned_txn_dml": ORACLE_VERSIONED_TXN_DML,
    "bloom_evolved_read": ORACLE_BLOOM_EVOLVED_READ,
    "replace_where_read": ORACLE_REPLACE_WHERE_READ,
    "versioned_date_bloom_read": ORACLE_VERSIONED_DATE_BLOOM_READ,
    "clustered_table_read": ORACLE_CLUSTERED_TABLE_READ,
    "versioned_update": ORACLE_VERSIONED_UPDATE,
    "stats_pushdown": ORACLE_STATS_PUSHDOWN,
    "versioned_range_read": ORACLE_VERSIONED_RANGE_READ,
    "zorder_table_read": ORACLE_ZORDER_TABLE_READ,
    "pii_redact": ORACLE_PII_REDACT,
    "bucketed_table_merge": ORACLE_BUCKETED_TABLE_MERGE,
    "normalize_text": ORACLE_NORMALIZE_TEXT,
    "merge_update_cols": ORACLE_MERGE_UPDATE_COLS,
    "bucketed_sorted_read": ORACLE_BUCKETED_SORTED_READ,
    "heavy_hitters_tokens": ORACLE_HEAVY_HITTERS_TOKENS,
    "purge_deletes": ORACLE_PURGE_DELETES,
    "partial_compact": ORACLE_PARTIAL_COMPACT,
    "schema_evolution_read": ORACLE_SCHEMA_EVOLUTION_READ,
    "html_extract": ORACLE_HTML_EXTRACT,
    "lm_perplexity": ORACLE_LM_PERPLEXITY,
}
